from .convert import convert_transcripts, ordered_output  # noqa: F401
from .partitioning import salted_repartition, bucket_col  # noqa: F401
from .checkpoint import run_with_checkpoint, read_lineage  # noqa: F401
