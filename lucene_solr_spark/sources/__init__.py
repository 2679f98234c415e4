from lucene_solr_spark.sources.webtext import synth_pages  # noqa: F401
from lucene_solr_spark.sources.loader import load_table, load_tables  # noqa: F401
