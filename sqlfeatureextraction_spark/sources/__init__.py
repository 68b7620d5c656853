from sqlfeatureextraction_spark.sources.io import (  # noqa: F401
    read_transcripts,
    read_raw_log_tsv,
    write_encoded_lines,
    read_encoded_lines,
)
