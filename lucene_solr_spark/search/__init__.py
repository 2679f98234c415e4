from lucene_solr_spark.search.ast import (  # noqa: F401
    AndQ,
    ConstQ,
    FuzzyQ,
    MatchAllQ,
    NotQ,
    OrQ,
    PhraseQ,
    PrefixQ,
    RegexpQ,
    TermInSetQ,
    TermQ,
    TermRangeQ,
    WildcardQ,
    parse_query,
)
from lucene_solr_spark.search.executor import Searcher  # noqa: F401
