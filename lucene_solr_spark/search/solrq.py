"""Solr local-params QParser dispatch — the `{!parser k=v}rest` request
syntax (solr/core/src/java/org/apache/solr/search/QParser.java
getParser + the *QParserPlugin registry). Implemented dialects map
onto existing engine operators:

  {!lucene}q / {!edismax}q   parse_query (the edismax-lite grammar)
  {!term f=F v=V}            TermQuery leaf (TermQParserPlugin.java)
  {!prefix f=F v=V}          PrefixQuery leaf (PrefixQParserPlugin)
  {!join from=A to=B}q       JoinQParserPlugin.java: match q, project
                             the matched docs' A values, return docs
                             whose B value is in that set (semi-join)
  {!collapse field=F}q       CollapsingQParserPlugin.java: match q,
                             keep the best doc per F group
                             (score desc, docid asc)

Only the single indexed text field exists, so f= must be 'text'; join
and collapse take their doc attributes from a (docid, field...) frame
— the doc-values role.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lucene_solr_spark.search import ast as A

_LOCAL_RE = re.compile(r'^\{!(\w+)((?:\s+\w+=(?:"[^"]*"|\S+?))*)\}(.*)$')
_PARAM_RE = re.compile(r'(\w+)=("[^"]*"|\S+)')


def parse_local_params(s: str):
    """'{!name a=1 b=x}rest' -> (name, {a: '1', b: 'x'}, 'rest');
    (None, {}, s) when there is no local-params prefix."""
    m = _LOCAL_RE.match(s.strip())
    if not m:
        return None, {}, s
    params = {k: v.strip('"') for k, v in _PARAM_RE.findall(m.group(2))}
    return m.group(1), params, m.group(3).strip()


def solr_qparser(searcher, s: str,
                 doc_attrs: DataFrame | None = None) -> DataFrame:
    """Dispatch a local-params request string; returns (docid, score).
    ``doc_attrs``: (docid, <field> ...) frame supplying the join /
    collapse field values."""
    name, params, rest = parse_local_params(s)
    if name in (None, "lucene", "edismax"):
        return searcher.matches(A.parse_query(rest if rest else s))
    if name in ("term", "prefix"):
        field = params.get("f", "text")
        if field != "text":
            raise ValueError(f"unknown field {field!r}")
        v = params.get("v", rest)
        node = A.TermQ(v.lower()) if name == "term" else A.PrefixQ(v.lower())
        return searcher.matches(node)
    if name == "join":
        frm, to = params["from"], params["to"]
        if doc_attrs is None:
            raise ValueError("{!join} needs a doc_attrs frame")
        inner = searcher.matches(A.parse_query(rest)).select("docid")
        vals = (doc_attrs.join(inner, "docid")
                .select(F.col(frm).alias("_v")).distinct())
        out = (doc_attrs.select("docid", F.col(to).alias("_v"))
               .join(F.broadcast(vals), "_v")
               .select("docid").distinct())
        return out.withColumn("score", F.lit(1.0))
    if name == "collapse":
        field = params["field"]
        if doc_attrs is None:
            raise ValueError("{!collapse} needs a doc_attrs frame")
        m = searcher.matches(A.parse_query(rest))
        j = m.join(doc_attrs.select("docid", field), "docid")
        w = Window.partitionBy(field).orderBy(
            F.desc("score"), F.asc("docid"))
        return (j.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1).select("docid", "score"))
    raise ValueError(f"unknown QParser dialect {name!r}")
