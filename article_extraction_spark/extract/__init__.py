from .core import (  # noqa: F401
    extract_html,
    extract_pdf,
    decode_utf8_ignore,
    to_text,
    classify_payload,
)
