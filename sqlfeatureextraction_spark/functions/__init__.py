from sqlfeatureextraction_spark.functions.text import (  # noqa: F401
    tokenize_col,
    clean_text_col,
    TOKEN_SPLIT_RE,
)
