from .synth import (  # noqa: F401
    make_pdf_bytes,
    synth_transcripts,
    transcripts_df,
    golden_df,
    transcripts_from_documents,
)
