from lucene_solr_spark.functions.bm25 import (  # noqa: F401
    BM25,
    byte315_to_float,
    float_to_byte315,
    length_norm_byte,
)
