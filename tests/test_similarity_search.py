

def test_pq_encode_and_adc_python_twin(spark):
    """PQ codes and ADC scores match a brute-force python twin; exact
    copies of the query share its codes and take the top ranks."""
    import numpy as np

    from article_extraction_spark.operators.similarity_search import (
        pq_adc_topk,
        pq_code_col,
        pq_train,
    )

    rng = np.random.default_rng(5)
    base = rng.normal(size=(60, 8)).astype(np.float32)
    query = base[0].tolist()
    rows = [(i, base[i].tolist()) for i in range(60)]
    rows += [(1000 + i, query) for i in range(3)]  # planted copies
    df = spark.createDataFrame(rows, "vid long, v array<float>")

    books = pq_train(df.where("vid < 60"), "v", m=4, k=4, max_iter=4, seed=7)
    assert len(books) == 4 and all(len(b) == 4 for b in books)

    got_codes = {
        r["vid"]: list(r["c"])
        for r in df.select("vid", pq_code_col("v", books).alias("c")).collect()
    }

    def py_code(vec):
        out = []
        for j, book in enumerate(books):
            s = vec[j * 2 : (j + 1) * 2]
            d = [sum((a - b) ** 2 for a, b in zip(s, c)) for c in book]
            out.append(d.index(min(d)))
        return out

    for vid, vec in rows:
        assert got_codes[vid] == py_code([float(x) for x in vec]), vid

    top = pq_adc_topk(df, "vid", "v", query, books, k=5).collect()

    def py_adc(codes):
        tot = 0.0
        for j, book in enumerate(books):
            qj = query[j * 2 : (j + 1) * 2]
            c = book[codes[j]]
            tot += sum((a - b) * (a - b) for a, b in zip(qj, c))
        return tot

    for r in top:
        assert r["adc"] == _pytest_approx(py_adc(list(r["codes"])))
    # exact expected ranking from the twin under the same (adc, id) order
    # (natural vectors CAN tie the query's codes — quantization — so the
    # expectation is computed, not assumed)
    expected = sorted(
        ((py_adc(py_code([float(x) for x in vec])), vid) for vid, vec in rows)
    )[:5]
    assert [r["vid"] for r in top] == [vid for _, vid in expected]
    # the query itself is always rank 1 (minimal adc, smallest id)
    assert top[0]["vid"] == 0


def _pytest_approx(x):
    import pytest

    return pytest.approx(x, rel=1e-9)
