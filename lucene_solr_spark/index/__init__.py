from lucene_solr_spark.index.builder import IndexTables, build_index  # noqa: F401
from lucene_solr_spark.index.docid import assign_doc_ids  # noqa: F401
