from lucene_solr_spark.analysis.standard import (  # noqa: F401
    ENGLISH_STOP_WORDS,
    MAX_TOKEN_LENGTH,
    analyze,
    analyze_series,
    tokens_udf,
    terms_only_udf,
)
