from cinegraph_spark.functions.text_clean import (
    CLEAN_STEP_ORDER,
    clean_subtitles,
    cleaning_fn,
    cleaning_sql,
)
from cinegraph_spark.functions import vector

__all__ = [
    "CLEAN_STEP_ORDER",
    "clean_subtitles",
    "cleaning_fn",
    "cleaning_sql",
    "vector",
]
