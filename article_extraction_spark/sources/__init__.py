from .dims import load_country_csv, load_hardware_csv  # noqa: F401
from .epoch import COLUMN_SETS, load_epoch_csv  # noqa: F401
from .fetch import doc_type_from_content_type_col, fetch_documents  # noqa: F401
