"""Column-expression library. Everything here is built-in-function
composition (JVM-side, whole-stage-codegen friendly) — no Python UDFs in
any hot path."""

from tiny_etl_multiproc_bigdata_spark.functions.text import (
    ARABIC_DIACRITICS,
    ARABIC_LETTER_CLASS,
    basename_backwards,
    len_str_gt,
    remove_chars,
    remove_diac,
    tokenize_words,
    truncate_str,
)
from tiny_etl_multiproc_bigdata_spark.functions.hashing import (
    md5_long,
    minhash_value,
    stable_token_hash,
)
from tiny_etl_multiproc_bigdata_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)

__all__ = [
    "ARABIC_DIACRITICS",
    "ARABIC_LETTER_CLASS",
    "basename_backwards",
    "len_str_gt",
    "remove_chars",
    "remove_diac",
    "tokenize_words",
    "truncate_str",
    "md5_long",
    "minhash_value",
    "stable_token_hash",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
]
