from lucene_solr_spark.streaming.nrt import append_batch, index_stream  # noqa: F401
