"""Direct parity vs the reference's fuzzy matchers and numeric parsing.

AST-loads the pure functions from the read-only reference checkout
(_jaro_winkler_similarity, _normalize_country/_normalize_hardware, token
splitters, _select_country_id, _select_hardware_info, _parse_numeric) and
asserts the engine's python twins agree on fixture + randomized inputs.
"""

from __future__ import annotations

import ast
import math
import os
import random

import pytest

REF_PATH = "/root/reference/tables/paper_information_table.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_PATH), reason="reference checkout not present"
)

_WANTED = {
    "_jaro_winkler_similarity", "_jaro_winkler_distance",
    "_normalize_country", "_normalize_hardware",
    "_split_country_tokens", "_split_hardware_tokens",
    "_clean_value", "_select_country_id", "_select_hardware_info",
    "_parse_numeric",
}
_WANTED_ASSIGNS = {"IGNORED_COUNTRY_TOKENS", "COUNTRY_ALIASES", "NUMERAL_MULTIPLIERS", "SHORT_SUFFIX_MULTIPLIERS"}


@pytest.fixture(scope="module")
def ref():
    src = open(REF_PATH, encoding="utf-8").read()
    tree = ast.parse(src)
    body = []
    found = set()
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in _WANTED:
            body.append(node)
            found.add(node.name)
        elif isinstance(node, ast.Assign):
            names = {t.id for t in node.targets if isinstance(t, ast.Name)}
            if names & _WANTED_ASSIGNS:
                body.append(node)
                found |= names
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            if node.target.id in _WANTED_ASSIGNS:
                body.append(node)
                found.add(node.target.id)
    assert _WANTED <= found, _WANTED - found
    ns: dict = {}
    exec("import pandas as pd\nfrom typing import Any, Optional, Sequence", ns)  # noqa: S102
    exec(compile(ast.Module(body=body, type_ignores=[]), REF_PATH, "exec"), ns)  # noqa: S102
    return ns


def _rand_strings(rng, n):
    alphabet = "abcdefg XYZ0123,;/&+()- "
    return ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 18))) for _ in range(n)]


def test_jaro_winkler_parity(ref):
    from article_extraction_spark.functions.similarity import jaro_winkler

    rng = random.Random(99)
    for a, b in zip(_rand_strings(rng, 400), _rand_strings(rng, 400)):
        assert math.isclose(jaro_winkler(a, b), ref["_jaro_winkler_similarity"](a, b), abs_tol=1e-12), (a, b)


def test_normalize_and_split_parity(ref):
    from article_extraction_spark.functions.textnorm import split_tokens
    from article_extraction_spark.operators.joins import normalize_alnum

    rng = random.Random(5)
    for s in _rand_strings(rng, 300) + ["NVIDIA A100-SXM4 (80GB)!", "a/b;c,d and e + f & g"]:
        assert normalize_alnum(s) == ref["_normalize_country"](s)
        assert normalize_alnum(s) == ref["_normalize_hardware"](s)
        assert split_tokens(s) == ref["_split_country_tokens"](s)
        assert split_tokens(s, extra_separators=True) == ref["_split_hardware_tokens"](s)


COUNTRY_CATALOG = [
    (1, "france"), (2, "germany"), (3, "korea republic of"),
    (4, "united states of america"), (5, "united kingdom"),
]
HW_CATALOG = [
    (1, "nvidia a100 sxm4 80 gb", 312.0, 0.4),
    (2, "nvidia v100", 125.0, 0.3),
    (3, "google tpu v4", 275.0, 0.192),
    (4, "amd mi250x", 383.0, 0.5),
]


def test_select_country_parity(ref):
    from article_extraction_spark.operators.joins import match_country

    rng = random.Random(17)
    fixed = [
        "South Korea", "Korea", "Germany / France", "USA", "united states",
        "Multinational", "unknown", None, "", "Frnace", "UK, Germany",
        "republic of korea; france",
    ]
    for raw in fixed + _rand_strings(rng, 300):
        assert match_country(raw, COUNTRY_CATALOG) == ref["_select_country_id"](raw, COUNTRY_CATALOG), raw


def test_select_hardware_parity(ref):
    from article_extraction_spark.operators.joins import match_hardware

    rng = random.Random(23)
    fixed = [
        "NVIDIA A100", "a100 + v100", "tpu v4 & mi250x", "TPUv4",
        "NVIDIA A100 SXM4 80 GB and V100", None, "", "abacus",
    ]
    for raw in fixed + _rand_strings(rng, 300):
        mine = match_hardware(raw, HW_CATALOG)
        theirs = ref["_select_hardware_info"](raw, HW_CATALOG)
        assert mine[0] == theirs[0], (raw, mine, theirs)  # id
        assert mine[1] == theirs[1] and mine[2] == theirs[2]  # compute/power
        if mine[3] is None or theirs[3] is None:
            assert (mine[3] or 0.0) == (theirs[3] or 0.0) or theirs[0] is None
        else:
            assert math.isclose(mine[3], theirs[3], abs_tol=1e-12)


def test_batch_matchers_equal_scalar_twins(ref):
    """The vectorized batch matchers (used inside the UDFs) must agree with
    the scalar reference-parity twins on the same corpus."""
    from article_extraction_spark.operators.joins import (
        _batch_match_country,
        _batch_match_hardware,
        match_country,
        match_hardware,
    )

    rng = random.Random(31)
    raws = [
        "South Korea", "Korea", "Germany / France", "USA", "Frnace",
        "NVIDIA A100", "a100 + v100", "TPUv4", None, "",
    ] + _rand_strings(rng, 400)
    got_c = _batch_match_country(raws, COUNTRY_CATALOG)
    got_h = _batch_match_hardware(raws, HW_CATALOG)
    for raw, gc, gh in zip(raws, got_c, got_h):
        assert gc == match_country(raw, COUNTRY_CATALOG), raw
        eh = match_hardware(raw, HW_CATALOG)
        assert gh[0] == eh[0] and gh[1] == eh[1] and gh[2] == eh[2], (raw, gh, eh)
        if gh[3] is None or eh[3] is None:
            assert gh[3] == eh[3], (raw, gh, eh)
        else:
            assert math.isclose(gh[3], eh[3], abs_tol=1e-12), raw


def test_parse_numeric_parity(ref):
    from article_extraction_spark.extraction.registry import _parse_numeric_py

    rng = random.Random(31)
    fixed = ["1.5k", "2M", "3b", "4T", "1,234", "12 000", "7", "x", "task", "", None, "1e3", "-5k"]
    numeric_soup = ["".join(rng.choice("0123456789., kmbt") for _ in range(rng.randint(1, 10))) for _ in range(400)]
    for raw in fixed + numeric_soup:
        theirs = ref["_parse_numeric"](raw)
        mine = _parse_numeric_py(raw)
        if theirs is None or (isinstance(theirs, float) and math.isnan(theirs)):
            assert mine is None, (raw, mine, theirs)
        else:
            assert mine == int(theirs), (raw, mine, theirs)
