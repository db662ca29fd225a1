from query_engine_spark.functions.ids import (
    datetime_to_tid,
    tid_to_datetime,
    did_to_key_col,
    key_to_did_col,
    post_id_to_uri_col,
    at_uri_to_post_id_col,
)
from query_engine_spark.functions.scripting import translate_script

__all__ = [
    "datetime_to_tid",
    "tid_to_datetime",
    "did_to_key_col",
    "key_to_did_col",
    "post_id_to_uri_col",
    "at_uri_to_post_id_col",
    "translate_script",
]
