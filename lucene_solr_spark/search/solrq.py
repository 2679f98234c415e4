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
  {!func}expr                FunctionQParserPlugin.java: every doc
                             scored by a ValueSource expression
  {!boost b=expr}q           BoostQParserPlugin.java / BoostedQuery:
                             inner query score * expr(doc)
  {!frange l=.. u=..}expr    FunctionRangeQParserPlugin.java: docs
                             whose expr value lies in [l, u]
                             (incl/incu control the bound closure),
                             constant score 1.0
  {!terms f=F}v1,v2,...      TermsQParserPlugin.java: field value in
                             a comma-separated set, constant score
  {!bool must=.. should=..   BoolQParserPlugin.java: explicit boolean
        must_not=..}         composition of sub-queries (one string
                             per occur; must+should = ReqOptSumScorer
                             shape)
  {!mlt maxqt=.. mindf=..}id MLTQParserPlugin.java: MoreLikeThis —
                             pick the doc's top tf*idf terms, OR-query
                             them, exclude the source doc
  {!field f=F}some text      FieldQParserPlugin.java: analyze the
                             value with the index analyzer — one token
                             becomes a TermQuery, several a PhraseQuery
                             (ps= sets the slop). Stop-filtered
                             position gaps collapse to consecutive
                             slots (documented deviation).
  {!raw f=F v=V}             RawQParserPlugin.java: the value is the
                             term, NO analysis.
  {!switch case=.. case.X=.. SwitchQParserPlugin.java: dispatch to the
        default=..}V         sub-query string selected by the value.
  {!maxscore}q               MaxScoreQParserPlugin.java: like lucene
                             but SHOULD groups score max-of-clauses
                             (OrQ subtrees become tie=0 DisMaxQ).
  {!complexphrase}"a b*"~n   ComplexPhraseQParserPlugin.java: phrase
                             whose wildcard tokens expand against the
                             term dictionary into MultiPhrase slots.
  {!surround}3W(a,b) / 3N    SurroundQParserPlugin.java subset: W/N
                             distance operators over two terms map to
                             ordered/unordered SpanNear (slop = n-1);
                             no analysis, constant score.
  {!parent which=<pq>}cq     BlockJoinParentQParser: parents (block
                             roots, the _root_ mechanics) with >= 1
                             child matching cq; ScoreMode.None.
  {!child of=<pq>}pq2        BlockJoinChildQParser: children of
                             parents matching both queries.
  {!graph from=A to=B        GraphQParserPlugin.java: frontier
        maxDepth=N}q         traversal from q's matches following
                             to-value -> from-value edges.
  {!geofilt sfield=L pt=     SpatialFilterQParser / geofilt: exact
        la,lo d=km}          haversine radius filter (bbox prefilter).
  {!bbox sfield=L pt= d=}    bbox: the circle's bounding box.
  {!rerank reRankQuery=<q>   ReRankQParserPlugin.java: top
        reRankDocs=N         reRankDocs of the main query get
        reRankWeight=W}q     + W * rerank score added.

Only the single indexed text field exists, so f= must be 'text' for
term/prefix/field/raw; join, collapse, func, boost, frange, terms,
parent/child (root=), graph (from=/to=) and geofilt/bbox (sfield=)
take their doc attributes from a (docid, field...) frame — the
doc-values role.

ValueSource expressions (ValueSourceParser.java registry subset):
  sum(a,b,..) product(a,b,..) sub(a,b) div(a,b) recip(x,m,a,b)
  linear(x,m,c) scale(x,lo,hi) sqrt(x) abs(x) ln(x) log(x) exp(x)
  pow(a,b) max(a,b) min(a,b) field(f) | bare field | numeric literal
recip(x,m,a,b) = a/(m*x+b); linear(x,m,c) = m*x+c; scale() performs
the global (min,max) pre-pass exactly like ScaleFloatFunction's
createWeight. Arithmetic folds left in the written argument order, so
a SQL oracle writing the same expression reproduces the doubles
bit-for-bit.

Index-stats ValueSources (need a searcher; ValueSourceParser.java's
docfreq/idf/termfreq/totaltermfreq/sumtotaltermfreq/maxdoc/numdocs
registrations):
  docfreq(text,T)           constant: the term's df
  idf(text,T)               constant: ln(1+(N-df+0.5)/(df+0.5)) — the
                            engine's BM25 idf (IDFValueSource routes
                            through the similarity)
  termfreq(text,T)          PER-DOC tf of T (0 when absent) — joined
                            onto the attrs frame by
                            augment_value_source_frame (the
                            TFValueSource postings walk)
  totaltermfreq(text,T)     constant: the term's ttf
  sumtotaltermfreq(text)    constant: collection sum_ttf
  maxdoc() / numdocs()      constant: doc count (no deletes here)
  strdist(a,b,edit)         1 - levenshtein/max(len) in float64
                            (StrDistanceFunction with
                            LevenshteinDistance; the reference rounds
                            through float32 — sub-ulp deviation,
                            absorbed by quantized oracles)
"""

from __future__ import annotations

import re

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lucene_solr_spark.search import ast as A

_LOCAL_RE = re.compile(
    r'^\{!(\w+)((?:\s+[\w.]+=(?:"[^"]*"|\'[^\']*\'|\S+?))*)\}(.*)$',
    re.DOTALL)  # bodies may span lines ({!xmlparser} XML trees)
_PARAM_RE = re.compile(r'([\w.]+)=("[^"]*"|\'[^\']*\'|\S+)')


def parse_local_params(s: str):
    """'{!name a=1 b=x}rest' -> (name, {a: '1', b: 'x'}, 'rest');
    (None, {}, s) when there is no local-params prefix. Values quote
    with " or ' (QueryParsing.parseLocalParams accepts both), letting
    nested sub-query strings carry spaces and braces."""
    m = _LOCAL_RE.match(s.strip())
    if not m:
        return None, {}, s
    params = {}
    for k, v in _PARAM_RE.findall(m.group(2)):
        if len(v) >= 2 and v[0] == v[-1] and v[0] in "\"'":
            v = v[1:-1]
        params[k] = v
    return m.group(1), params, m.group(3).strip()


# ---- ValueSource expression parser -----------------------------------------

_VS_TOKEN = re.compile(
    r"\s*([A-Za-z_]\w*|-?\d+\.?\d*(?:[eE]-?\d+)?|'[^']*'|[(),])")


def parse_value_source(expr: str):
    """Parse a Solr function-query expression into a nested tuple AST:
    ('call', name, [args...]) | ('field', name) | ('num', float).
    Grammar and function names follow ValueSourceParser.java's
    registry (the subset documented in the module docstring)."""
    toks, i = [], 0
    while i < len(expr):
        m = _VS_TOKEN.match(expr, i)
        if not m:
            raise ValueError(f"bad value-source syntax at {expr[i:]!r}")
        toks.append(m.group(1))
        i = m.end()
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def parse_node():
        nonlocal pos
        t = peek()
        if t is None:
            raise ValueError("unexpected end of expression")
        pos += 1
        if re.fullmatch(r'-?\d+\.?\d*(?:[eE]-?\d+)?', t):
            return ("num", float(t))
        if t.startswith("'") and t.endswith("'"):
            return ("str", t[1:-1])
        if peek() == "(":
            pos += 1  # consume '('
            args = []
            if peek() != ")":
                args.append(parse_node())
                while peek() == ",":
                    pos += 1
                    args.append(parse_node())
            if peek() != ")":
                raise ValueError(f"missing ')' in {expr!r}")
            pos += 1
            if t == "field":
                if len(args) != 1 or args[0][0] != "field":
                    raise ValueError("field() takes one field name")
                return args[0]
            return ("call", t, args)
        return ("field", t)

    node = parse_node()
    if pos != len(toks):
        raise ValueError(f"trailing tokens in {expr!r}: {toks[pos:]}")
    return node


_VS_ARITY = {"sub": 2, "div": 2, "recip": 4, "linear": 3, "scale": 3,
             "sqrt": 1, "abs": 1, "ln": 1, "log": 1, "exp": 1,
             "pow": 2, "max": 2, "min": 2,
             "docfreq": 2, "idf": 2, "termfreq": 2, "totaltermfreq": 2,
             "sumtotaltermfreq": 1, "maxdoc": 0, "numdocs": 0,
             "strdist": 3,
             # boolean/conditional family (ValueSourceParser.java's
             # if/exists/def/map/not/and/or/xor + comparison parsers;
             # booleans surface as 1.0/0.0 doubles, non-zero = true)
             "if": 3, "exists": 1, "def": 2, "not": 1,
             "and": 2, "or": 2, "xor": 2,
             "gt": 2, "lt": 2, "gte": 2, "lte": 2, "eq": 2}

_VS_NEEDS_SEARCHER = ("docfreq", "idf", "termfreq", "totaltermfreq",
                      "sumtotaltermfreq", "maxdoc", "numdocs")


def _vs_name_arg(node, fn: str) -> str:
    """Term/field argument of an index-stats function: a bare
    identifier or a quoted string."""
    if node[0] in ("field", "str"):
        return node[1]
    raise ValueError(f"{fn}() takes a term/field name, got {node!r}")


def collect_termfreq_terms(node) -> list[str]:
    """Terms referenced by termfreq(text, T) calls in the AST."""
    out: list[str] = []
    if node[0] == "call":
        if node[1] == "termfreq" and len(node[2]) == 2:
            out.append(_vs_name_arg(node[2][1], "termfreq"))
        for a in node[2]:
            out.extend(collect_termfreq_terms(a))
    return out


def augment_value_source_frame(node, doc_attrs: DataFrame,
                               searcher) -> DataFrame:
    """Join a per-doc ``_tf_<term>`` column for every termfreq(text,T)
    in the AST — the TFValueSource postings walk, expressed as one
    left join per distinct term (docs without the term read 0)."""
    terms = sorted(set(collect_termfreq_terms(node)))
    if not terms:
        return doc_attrs
    if searcher is None:
        raise ValueError("termfreq() needs a searcher")
    for t in terms:
        col = f"_tf_{t}"
        if col in doc_attrs.columns:
            continue
        tfs = (searcher.index.postings.where(F.col("term") == t)
               .select("docid", F.col("tf").alias(col)))
        doc_attrs = doc_attrs.join(tfs, "docid", "left")
    return doc_attrs


def value_source_column(node, doc_attrs: DataFrame,
                        searcher=None) -> F.Column:
    """Evaluate a parsed ValueSource AST to a Spark Column over the
    doc_attrs frame. scale() triggers one (min,max) aggregate on
    doc_attrs — the ScaleFloatFunction.createWeight two-pass shape.
    Index-stats functions resolve through ``searcher`` (constants fold
    driver-side; termfreq reads the ``_tf_<term>`` column joined by
    augment_value_source_frame). All arithmetic is double-precision in
    the written fold order."""
    kind = node[0]
    if kind == "num":
        return F.lit(float(node[1]))
    if kind == "field":
        if doc_attrs is None or node[1] not in doc_attrs.columns:
            raise ValueError(f"unknown value-source field {node[1]!r}")
        return F.col(node[1]).cast("double")
    if kind == "str":
        return F.lit(node[1])
    name, args = node[1], node[2]
    if name in _VS_ARITY and len(args) != _VS_ARITY[name]:
        raise ValueError(f"{name}() takes {_VS_ARITY[name]} args")
    if name in _VS_NEEDS_SEARCHER:
        if searcher is None:
            raise ValueError(f"{name}() needs a searcher")
        if name in ("maxdoc", "numdocs"):
            return F.lit(float(searcher.index.coll_stats["doc_count"]))
        if name == "sumtotaltermfreq":
            if _vs_name_arg(args[0], name) != "text":
                raise ValueError("only the 'text' field is indexed")
            return F.lit(float(searcher.index.coll_stats["sum_ttf"]))
        if _vs_name_arg(args[0], name) != "text":
            raise ValueError("only the 'text' field is indexed")
        term = _vs_name_arg(args[1], name)
        if name == "termfreq":
            col = f"_tf_{term}"
            if doc_attrs is None or col not in doc_attrs.columns:
                raise ValueError(
                    "termfreq() needs augment_value_source_frame first")
            return F.coalesce(F.col(col), F.lit(0)).cast("double")
        df_t = searcher._df_for({term})[term]
        if name == "docfreq":
            return F.lit(float(df_t))
        if name == "idf":
            n = float(searcher.index.coll_stats["doc_count"])
            return F.lit(float(np.log(
                1.0 + (n - df_t + 0.5) / (df_t + 0.5))))
        # totaltermfreq
        row = (searcher.index.term_stats.where(F.col("term") == term)
               .select("ttf").collect())
        return F.lit(float(row[0]["ttf"]) if row else 0.0)
    if name == "strdist":
        method = _vs_name_arg(args[2], "strdist")
        if method != "edit":
            raise ValueError("strdist: only the 'edit' method is "
                             "implemented")
        a = (F.col(_vs_name_arg(args[0], "strdist"))
             if args[0][0] == "field" else F.lit(args[0][1]))
        b = (F.col(_vs_name_arg(args[1], "strdist"))
             if args[1][0] == "field" else F.lit(args[1][1]))
        return (F.lit(1.0) - F.levenshtein(a, b).cast("double")
                / F.greatest(F.length(a), F.length(b)).cast("double"))
    if name == "scale":
        src = value_source_column(args[0], doc_attrs, searcher)
        if args[1][0] != "num" or args[2][0] != "num":
            raise ValueError("scale() bounds must be numeric literals")
        lo, hi = float(args[1][1]), float(args[2][1])
        row = doc_attrs.agg(F.min(src).alias("mn"),
                            F.max(src).alias("mx")).collect()[0]
        mn, mx = float(row["mn"]), float(row["mx"])
        span = (mx - mn) or 1.0
        return (src - F.lit(mn)) / F.lit(span) * F.lit(hi - lo) + F.lit(lo)
    cols = [value_source_column(a, doc_attrs, searcher) for a in args]
    if name == "sum":
        out = cols[0]
        for c in cols[1:]:
            out = out + c
        return out
    if name in ("product", "mul"):
        out = cols[0]
        for c in cols[1:]:
            out = out * c
        return out
    if name == "sub":
        return cols[0] - cols[1]
    if name == "div":
        return cols[0] / cols[1]
    if name == "recip":
        x, m, a, b = cols
        return a / (m * x + b)
    if name == "linear":
        x, m, c = cols
        return m * x + c
    if name == "sqrt":
        return F.sqrt(cols[0])
    if name == "abs":
        return F.abs(cols[0])
    if name == "ln":
        return F.log(cols[0])
    if name == "log":
        return F.log10(cols[0])
    if name == "exp":
        return F.exp(cols[0])
    if name == "pow":
        return F.pow(cols[0], cols[1])
    if name == "max":
        return F.greatest(cols[0], cols[1])
    if name == "min":
        return F.least(cols[0], cols[1])
    # boolean/conditional family: booleans are 1.0/0.0, non-zero = true
    # (SimpleBoolFunction/IfFunction semantics from ValueSourceParser)
    if name == "if":
        return F.when(cols[0] != 0, cols[1]).otherwise(cols[2])
    if name == "exists":
        return F.when(cols[0].isNotNull(), F.lit(1.0)).otherwise(F.lit(0.0))
    if name == "def":
        return F.coalesce(cols[0], cols[1])
    if name == "not":
        return F.when(cols[0] != 0, F.lit(0.0)).otherwise(F.lit(1.0))
    if name in ("and", "or", "xor"):
        a, b = cols[0] != 0, cols[1] != 0
        c = {"and": a & b, "or": a | b, "xor": a != b}[name]
        return F.when(c, F.lit(1.0)).otherwise(F.lit(0.0))
    if name in ("gt", "lt", "gte", "lte", "eq"):
        c = {"gt": cols[0] > cols[1], "lt": cols[0] < cols[1],
             "gte": cols[0] >= cols[1], "lte": cols[0] <= cols[1],
             "eq": cols[0] == cols[1]}[name]
        return F.when(c, F.lit(1.0)).otherwise(F.lit(0.0))
    if name == "map":
        # map(v,min,max,target[,def]): v in [min,max] -> target,
        # else def (or v unchanged) — MapFloatFunction
        if len(args) not in (4, 5):
            raise ValueError("map() takes 4 or 5 args")
        v, lo, hi, tgt = cols[:4]
        other = cols[4] if len(cols) == 5 else v
        return F.when((v >= lo) & (v <= hi), tgt).otherwise(other)
    raise ValueError(f"unknown value-source function {name!r}")


def solr_qparser(searcher, s: str,
                 doc_attrs: DataFrame | None = None) -> DataFrame:
    """Dispatch a local-params request string; returns (docid, score).
    ``doc_attrs``: (docid, <field> ...) frame supplying the join /
    collapse field values."""
    name, params, rest = parse_local_params(s)
    if name in (None, "lucene", "oldlucene", "edismax"):
        # q.op local param (LuceneQParser's QueryParsing.getQueryParser
        # default-operator wiring)
        op = params.get("q.op", "OR").lower()
        return searcher.matches(A.parse_query(rest if rest else s,
                                              default_op=op))
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
    if name == "func":
        # FunctionQParserPlugin.java -> FunctionQuery: every doc in
        # the attrs frame scored by the expression (matches-all).
        if doc_attrs is None:
            raise ValueError("{!func} needs a doc_attrs frame")
        node = parse_value_source(rest)
        doc_attrs = augment_value_source_frame(node, doc_attrs, searcher)
        col = value_source_column(node, doc_attrs, searcher)
        return doc_attrs.select("docid", col.alias("score"))
    if name == "boost":
        # BoostQParserPlugin.java / queries/function/BoostedQuery:
        # inner score multiplied by the ValueSource, in that op order.
        if doc_attrs is None:
            raise ValueError("{!boost} needs a doc_attrs frame")
        if "b" not in params:
            raise ValueError("{!boost} needs b=<value source>")
        node = parse_value_source(params["b"])
        doc_attrs = augment_value_source_frame(node, doc_attrs, searcher)
        col = value_source_column(node, doc_attrs, searcher)
        m = searcher.matches(A.parse_query(rest))
        return (m.join(doc_attrs, "docid")
                .select("docid", (F.col("score") * col).alias("score")))
    if name == "frange":
        # FunctionRangeQParserPlugin.java -> FunctionRangeQuery:
        # ValueSourceRangeFilter over the expression, constant score.
        if doc_attrs is None:
            raise ValueError("{!frange} needs a doc_attrs frame")
        node = parse_value_source(rest)
        doc_attrs = augment_value_source_frame(node, doc_attrs, searcher)
        col = value_source_column(node, doc_attrs, searcher)
        cond = F.lit(True)
        if "l" in params:
            lo = F.lit(float(params["l"]))
            cond = cond & (col >= lo if params.get("incl", "true")
                           == "true" else col > lo)
        if "u" in params:
            hi = F.lit(float(params["u"]))
            cond = cond & (col <= hi if params.get("incu", "true")
                           == "true" else col < hi)
        return (doc_attrs.withColumn("_v", col).where(cond)
                .select("docid", F.lit(1.0).alias("score")))
    if name == "terms":
        # TermsQParserPlugin.java: field value IN a comma-separated
        # set; text routes to indexed TermInSetQ, other fields to the
        # attrs frame. Constant score 1.0 (the plugin's default).
        vals = [v for v in rest.split(",") if v]
        field = params.get("f", "text")
        if field == "text":
            return (searcher.matches(
                A.TermInSetQ(tuple(v.lower() for v in vals)))
                .select("docid", F.lit(1.0).alias("score")))
        if doc_attrs is None:
            raise ValueError("{!terms} on a non-text field needs "
                             "a doc_attrs frame")
        return (doc_attrs.where(F.col(field).cast("string").isin(vals))
                .select("docid", F.lit(1.0).alias("score")))
    if name == "bool":
        # BoolQParserPlugin.java: must/should/must_not params each
        # hold a sub-query string. must+should composes as the
        # ReqOptSumScorer shape (required score, optional added when
        # it co-matches); must_not wraps the result in an exclusion.
        must = A.parse_query(params["must"]) if "must" in params else None
        should = (A.parse_query(params["should"])
                  if "should" in params else None)
        if must is not None and should is not None:
            node = A.ReqOptQ(must, should)
        elif must is not None:
            node = must
        elif should is not None:
            node = should
        else:
            raise ValueError("{!bool} needs must= and/or should=")
        if "must_not" in params:
            node = A.NotQ(node, A.parse_query(params["must_not"]))
        return searcher.matches(node)
    if name == "mlt":
        # MLTQParserPlugin.java: body is the source docid; interesting
        # terms ranked by tf*idf (MoreLikeThis.java), OR-queried,
        # source doc excluded. The <= maxqt selected terms transit the
        # driver — MLT is inherently two-phase (term selection, then
        # query), like the reference's.
        from lucene_solr_spark.operators.searchext import (
            more_like_this_terms)

        doc = int(rest)
        max_terms = int(params.get("maxqt", 10))
        min_df = int(params.get("mindf", 2))
        terms = [r["term"] for r in more_like_this_terms(
            searcher.index, doc, max_terms, min_df).collect()]
        if not terms:
            return (searcher.index.docs.select("docid")
                    .where(F.lit(False))
                    .withColumn("score", F.lit(0.0)))
        m = searcher.matches(A.OrQ(tuple(A.TermQ(t) for t in terms)))
        return m.where(F.col("docid") != doc)
    if name == "field":
        # FieldQParserPlugin.java: value through the index analyzer;
        # 1 token -> TermQuery, else PhraseQuery (ps= slop).
        from lucene_solr_spark.analysis.standard import analyze

        field = params.get("f", "text")
        if field != "text":
            raise ValueError(f"unknown field {field!r}")
        toks = [t for t, _ in analyze(params.get("v", rest))]
        if not toks:
            return _empty(searcher)
        node = (A.TermQ(toks[0]) if len(toks) == 1
                else A.PhraseQ(tuple(toks), slop=int(params.get("ps", 0))))
        return searcher.matches(node)
    if name == "raw":
        # RawQParserPlugin.java: the value IS the term, no analysis.
        field = params.get("f", "text")
        if field != "text":
            raise ValueError(f"unknown field {field!r}")
        return searcher.matches(A.TermQ(params.get("v", rest)))
    if name == "switch":
        # SwitchQParserPlugin.java: the value selects a sub-query.
        v = (params.get("v", rest) or "").strip()
        target = params.get(f"case.{v}") if v else params.get("case")
        if target is None:
            target = params.get("default")
        if target is None:
            raise ValueError(f"{{!switch}}: no case for {v!r} and "
                             "no default=")
        return solr_qparser(searcher, target, doc_attrs)
    if name == "maxscore":
        # MaxScoreQParserPlugin.java: SHOULD groups take the max
        # clause score instead of the sum -> every OrQ subtree
        # becomes a tie_breaker=0 DisjunctionMaxQuery.
        def to_max(node: A.Query) -> A.Query:
            if isinstance(node, A.OrQ) and node.min_should_match <= 1:
                return A.DisMaxQ(tuple(to_max(c) for c in node.clauses))
            if isinstance(node, A.AndQ):
                return A.AndQ(tuple(to_max(c) for c in node.clauses))
            if isinstance(node, A.NotQ):
                return A.NotQ(to_max(node.positive), to_max(node.negative))
            if isinstance(node, A.ReqOptQ):
                return A.ReqOptQ(to_max(node.required),
                                 to_max(node.optional))
            return node

        return searcher.matches(to_max(A.parse_query(rest)))
    if name == "complexphrase":
        # ComplexPhraseQParserPlugin.java: quoted phrase whose
        # wildcard tokens expand against the term dictionary
        # (maxBooleanClauses-capped) into MultiPhrase slots.
        m = re.fullmatch(r'\s*"([^"]*)"(?:~(\d+))?\s*',
                         params.get("v", rest))
        if not m:
            raise ValueError("{!complexphrase} body must be a quoted "
                             "phrase with optional ~slop")
        words = [w.lower() for w in m.group(1).split()]
        slop = int(m.group(2) or 0)
        if not words:
            return _empty(searcher)
        slots = []
        for w in words:
            if "*" in w or "?" in w:
                pred = F.col("term").rlike(A.WildcardQ(w).to_regex())
                exp = [r["term"] for r in
                       searcher.index.term_stats.where(pred)
                       .select("term").orderBy("term").limit(1024)
                       .collect()]
                if not exp:
                    return _empty(searcher)
                slots.append(tuple(exp))
            else:
                slots.append((w,))
        if len(slots) == 1:
            node = (A.TermQ(slots[0][0]) if len(slots[0]) == 1
                    else A.SynonymQ(slots[0]))
            return searcher.matches(node)
        return searcher.matches(A.MultiPhraseQ(tuple(slots), slop=slop))
    if name == "surround":
        # SurroundQParserPlugin.java subset: <n>W(a,b) ordered /
        # <n>N(a,b) unordered distance operators over two terms ->
        # SpanNear with slop = n-1 (surround's n counts positions
        # inclusively; 1W = adjacent). No analysis, constant score.
        m = re.fullmatch(r'\s*(\d*)([WwNn])\s*\(\s*([^,\s]+)\s*,'
                         r'\s*([^,\s)]+)\s*\)\s*', rest)
        if not m:
            raise ValueError("{!surround} supports <n>W(a,b) / "
                             "<n>N(a,b) over two terms")
        n = int(m.group(1) or 1)
        return searcher.matches(A.SpanNearQ(
            m.group(3), m.group(4), slop=n - 1,
            in_order=m.group(2) in ("W", "w")))
    if name in ("parent", "child"):
        # BlockJoinParentQParser / BlockJoinChildQParser: block
        # structure via a _root_-style column (param root=, default
        # root_id) mapping every doc to its block root docid.
        if doc_attrs is None:
            raise ValueError(f"{{!{name}}} needs a doc_attrs frame")
        root_col = params.get("root", "root_id")
        blocks = doc_attrs.select("docid", F.col(root_col).alias("_root"))
        if name == "parent":
            if "which" not in params:
                raise ValueError("{!parent} needs which=<parent query>")
            parents = solr_qparser(searcher, params["which"], doc_attrs) \
                .select("docid")
            kids = searcher.matches(A.parse_query(rest)).select("docid")
            hit_roots = (blocks.join(kids, "docid")
                         .where(F.col("docid") != F.col("_root"))
                         .select(F.col("_root").alias("docid")).distinct())
            return (hit_roots.join(parents, "docid")
                    .withColumn("score", F.lit(1.0)))
        if "of" not in params:
            raise ValueError("{!child} needs of=<parent query>")
        all_parents = solr_qparser(searcher, params["of"], doc_attrs) \
            .select("docid")
        matched = (searcher.matches(A.parse_query(rest)).select("docid")
                   .join(all_parents, "docid"))
        return (blocks.join(matched.withColumnRenamed("docid", "_root"),
                            "_root")
                .where(F.col("docid") != F.col("_root"))
                .select("docid").withColumn("score", F.lit(1.0)))
    if name == "graph":
        # GraphQParserPlugin.java: roots = matches of q; repeatedly
        # follow edges (a frontier doc's from= values select docs
        # whose to= value matches) until fixpoint or maxDepth.
        # returnRoot=true default. Frontier joins only — no collect.
        if doc_attrs is None:
            raise ValueError("{!graph} needs a doc_attrs frame")
        frm, to = params["from"], params["to"]
        max_depth = int(params.get("maxDepth", -1))
        return_root = params.get("returnRoot", "true") == "true"
        edges = doc_attrs.select("docid", F.col(frm).alias("_f"),
                                 F.col(to).alias("_t"))
        roots = searcher.matches(A.parse_query(rest)).select("docid")
        visited = roots
        frontier = roots
        depth = 0
        while max_depth < 0 or depth < max_depth:
            vals = (edges.join(frontier, "docid")
                    .select(F.col("_f").alias("_t")).distinct())
            nxt = (edges.join(F.broadcast(vals), "_t")
                   .select("docid").distinct()
                   .join(visited, "docid", "left_anti"))
            if nxt.isEmpty():
                break
            visited = visited.unionByName(nxt)
            frontier = nxt
            depth += 1
        out = visited if return_root else visited.join(
            roots, "docid", "left_anti")
        return out.withColumn("score", F.lit(1.0))
    if name in ("geofilt", "bbox"):
        # SpatialFilterQParser (geofilt/bbox): sfield=L reads columns
        # L_lat / L_lon off doc_attrs; d= is kilometers (Solr's unit).
        # geofilt = exact haversine radius (bbox prefilter inside
        # distance_query); bbox = the circle's bounding box only.
        from lucene_solr_spark.operators.spatial import (
            _bbox_of_circle, box_query, distance_query)

        if doc_attrs is None:
            raise ValueError(f"{{!{name}}} needs a doc_attrs frame")
        sfield = params["sfield"]
        lat_s, lon_s = params["pt"].split(",")
        lat, lon = float(lat_s), float(lon_s)
        radius_m = float(params["d"]) * 1000.0
        g = doc_attrs.select("docid",
                             F.col(f"{sfield}_lat").alias("lat"),
                             F.col(f"{sfield}_lon").alias("lon"))
        if name == "geofilt":
            hits = distance_query(g, lat, lon, radius_m)
        else:
            min_lat, max_lat, min_lon, max_lon = _bbox_of_circle(
                lat, lon, radius_m)
            hits = box_query(g, min_lat, max_lat, min_lon, max_lon)
        return hits.select("docid").withColumn("score", F.lit(1.0))
    if name == "rerank":
        # ReRankQParserPlugin.java: run the main query; the top
        # reRankDocs (by score desc, docid asc) get reRankWeight *
        # rerank-query score ADDED; docs past the window keep their
        # first-pass score.
        if "reRankQuery" not in params:
            raise ValueError("{!rerank} needs reRankQuery=")
        n = int(params.get("reRankDocs", 200))
        wgt = float(params.get("reRankWeight", 2.0))
        main = searcher.matches(A.parse_query(rest))
        rr = (solr_qparser(searcher, params["reRankQuery"], doc_attrs)
              .withColumnRenamed("score", "_rr"))
        w = Window.orderBy(F.desc("score"), F.asc("docid"))
        ranked = main.withColumn("_rn", F.row_number().over(w))
        return (ranked.join(rr, "docid", "left")
                .select("docid",
                        F.when(
                            (F.col("_rn") <= n) & F.col("_rr").isNotNull(),
                            F.col("score").cast("double")
                            + F.lit(wgt) * F.col("_rr").cast("double"))
                        .otherwise(F.col("score").cast("double"))
                        .alias("score")))
    if name == "dismax":
        # DisMaxQParser.java: the user query is a FREE-TEXT term list
        # (no operator syntax — that's the dismax contract); each term
        # becomes a DisMax over the qf fields with tie=, and terms
        # combine as SHOULD clauses with mm= (integer min-match).
        # Needs a MultiFieldSearcher (FieldedQ leaves).
        from lucene_solr_spark.search.multifield import edismax_qf

        if "qf" not in params:
            raise ValueError("{!dismax} needs qf=")
        qf: dict[str, float] = {}
        for part in params["qf"].split():
            f_, _, b = part.partition("^")
            qf[f_] = float(b) if b else 1.0
        node = edismax_qf(rest, qf,
                          tie_breaker=float(params.get("tie", 0.0)),
                          min_should_match=int(params.get("mm", 1)))
        return searcher.matches(node)
    if name == "knn":
        # KnnQParserPlugin.java (solr/core/.../search/neural/): the
        # body is the query vector "[v1, v2, ...]"; f= names the
        # vector column on doc_attrs; topK bounds the result. Score =
        # cosine (Solr's default similarityFunction), computed by the
        # same JVM-side fold as operators/similarity.py — no UDF.
        from lucene_solr_spark.operators.similarity import cosine

        if doc_attrs is None:
            raise ValueError("{!knn} needs a doc_attrs frame")
        vec_col = params.get("f", "embedding")
        top_k = int(params.get("topK", 10))
        body = rest.strip()
        if body.startswith("[") and body.endswith("]"):
            body = body[1:-1]
        qv = [float(x) for x in body.split(",") if x.strip()]
        qlit = F.array(*[F.lit(x) for x in qv])
        scored = doc_attrs.select(
            "docid", cosine(F.col(vec_col), qlit).alias("score"))
        return scored.orderBy(F.desc("score"), F.asc("docid")).limit(top_k)
    if name == "hash":
        # HashQParserPlugin.java (the /export parallel-stream
        # partitioner): keep docs whose partition-key hash lands on
        # this worker. Hash = first 8 md5 hex digits as an integer —
        # the engine-portable hash the HLL sketch uses, so a DuckDB
        # oracle reproduces the partition exactly.
        if doc_attrs is None:
            raise ValueError("{!hash} needs a doc_attrs frame")
        workers = int(params["workers"])
        worker = int(params["worker"])
        key = params.get("partitionKeys")
        if key is None:
            raise ValueError("{!hash} needs partitionKeys=")
        h = (F.conv(F.substring(F.md5(F.col(key).cast("string")), 1, 8),
                    16, 10).cast("long"))
        return (doc_attrs.where(h % workers == F.lit(worker))
                .select("docid", F.lit(1.0).alias("score")))
    if name == "rank":
        # RankQParserPlugin.java (Solr 9) over the FeatureField
        # functions (lucene/core/.../document/FeatureField.java):
        # satu = w * v/(v+pivot), log = w * ln(scalingFactor + v),
        # linear = w * v; docs with feature > 0 match.
        if doc_attrs is None:
            raise ValueError("{!rank} needs a doc_attrs frame")
        v = F.col(params["f"]).cast("double")
        fn = params.get("function", "satu")
        wgt = float(params.get("weight", 1.0))
        if fn == "satu":
            e = v / (v + F.lit(float(params.get("pivot", 1.0))))
        elif fn == "log":
            e = F.log(F.lit(float(params.get("scalingFactor", 1.0))) + v)
        elif fn == "linear":
            e = v
        else:
            raise ValueError(f"{{!rank}} unknown function {fn!r}")
        return (doc_attrs.where(v > 0)
                .select("docid", (F.lit(wgt) * e).alias("score")))
    if name in ("query", "nested"):
        # NestedQParserPlugin.java ({!query}): the body (or v=) is
        # itself a full local-params request — dispatch recursively.
        return solr_qparser(searcher, params.get("v", rest), doc_attrs)
    if name == "graphterms":
        # GraphTermsQParserPlugin.java: like {!terms} but terms whose
        # df exceeds maxDocFreq are DROPPED (the graph-traversal
        # frontier filter that keeps zipf-head hubs from exploding).
        vals = [v.lower() for v in rest.split(",") if v]
        max_df = int(params.get("maxDocFreq", 2 ** 31 - 1))
        stats = (searcher.index.term_stats
                 .where(F.col("term").isin(vals))
                 .where(F.col("df") <= max_df)
                 .select("term").collect())
        keep = tuple(sorted(r["term"] for r in stats))
        if not keep:
            return _empty(searcher)
        return (searcher.matches(A.TermInSetQ(keep))
                .select("docid", F.lit(1.0).alias("score")))
    if name == "simple":
        # SimpleQParserPlugin.java -> queryparser/simple/
        # SimpleQueryParser.java: +|- connectives, "phrase"~N,
        # trailing-* prefix, term~N fuzzy, parens; whitespace = the
        # q.op default (OR). Never throws on odd syntax by contract —
        # we keep the subset grammar strict enough to be testable.
        node = _parse_simple(rest, params.get("q.op", "OR"))
        return searcher.matches(node)
    if name == "xmlparser":
        # XmlQParserPlugin.java -> queryparser/xml/CoreParser.java:
        # the body is an XML query tree; element builders map onto the
        # same AST the string parsers build.
        return searcher.matches(parse_xml_query(rest))
    if name == "igain":
        # IGainTermsQParserPlugin.java (the `features` streaming
        # expression's trainer): over a labeled training set
        # (doc_attrs: docid, outcome 0/1), score each candidate term
        # by information gain of term-presence w.r.t. the outcome,
        # returning the top numTerms as (term rows, score = gain).
        # Entropy terms use natural log; xlogx(0) = 0.
        if doc_attrs is None:
            raise ValueError("{!igain} needs a doc_attrs frame "
                             "(docid, outcome)")
        n_terms = int(params.get("numTerms", 10))
        labeled = doc_attrs.select("docid",
                                   F.col("outcome").cast("double")
                                   .alias("_y"))
        joined = (searcher.index.postings
                  .join(labeled, "docid")
                  .groupBy("term")
                  .agg(F.count(F.lit(1)).alias("_n1"),
                       F.sum("_y").alias("_p1")))
        tot = labeled.agg(F.count(F.lit(1)).alias("n"),
                          F.sum("_y").alias("p")).collect()[0]
        n_all, p_all = float(tot["n"]), float(tot["p"])

        def xlogx(x):
            return F.when(x > 0, x * F.log(x)).otherwise(F.lit(0.0))

        def entropy(p, n):
            # H of a (pos=p, total=n) split, in nats; 0 for empty
            q_ = (p / n)
            return F.when(n > 0, -(xlogx(q_) + xlogx(1.0 - q_))) \
                    .otherwise(F.lit(0.0))

        h_all = entropy(F.lit(p_all), F.lit(n_all))
        n1 = F.col("_n1").cast("double")
        p1 = F.col("_p1")
        n0 = F.lit(n_all) - n1
        p0 = F.lit(p_all) - p1
        gain = (h_all - (n1 / F.lit(n_all)) * entropy(p1, n1)
                - (n0 / F.lit(n_all)) * entropy(p0, n0))
        scored = joined.select(F.col("term"), gain.alias("score"))
        return (scored.orderBy(F.desc("score"), F.asc("term"))
                .limit(n_terms))
    if name == "ltr":
        # LTRQParserPlugin.java ({!ltr model=... reRankDocs=...}):
        # the model store is inlined as a JSON param — features map
        # names to ValueSource expressions (SolrFeature) or
        # "originalScore" (OriginalScoreFeature); "weights" = a
        # LinearModel, "trees" = MultipleAdditiveTreesModel. The body
        # is the first-pass query.
        import json as _json

        from lucene_solr_spark.operators.ltr import (additive_trees_model,
                                                     linear_model,
                                                     ltr_rerank)

        if doc_attrs is None:
            raise ValueError("{!ltr} needs a doc_attrs frame")
        if "model" not in params:
            raise ValueError("{!ltr} needs model=<json>")
        spec = _json.loads(params["model"])
        feats = spec.get("features")
        if not feats:
            raise ValueError("{!ltr} model needs features")
        if "weights" in spec:
            mdl = linear_model(spec["weights"])
        elif "trees" in spec:
            mdl = additive_trees_model(spec["trees"])
        else:
            raise ValueError("{!ltr} model needs weights or trees")
        n = int(params.get("reRankDocs", 200))
        return (ltr_rerank(searcher, rest, doc_attrs, feats, model=mdl,
                           rerank_docs=n)
                .select("docid", "score"))
    if name == "export":
        # ExportWriter.java:82,229 as a dialect ({!export} is the
        # /export handler's sort/fl surface): sorted full-result
        # export of the matching docs' fl fields. sort_stream = a
        # distributed range-partitioned sort, never the handler's
        # in-memory pass; ordinality rides the sort keys (callers
        # needing an explicit ordinal wrap with relational.ranked at
        # top-k scale).
        from lucene_solr_spark.operators.relational import sort_stream

        sort_spec = params.get("sort")
        fl = params.get("fl")
        if not sort_spec or not fl:
            raise ValueError("{!export} needs sort= and fl=")
        if doc_attrs is None:
            raise ValueError("{!export} needs a doc_attrs frame")
        cols = [c.strip() for c in fl.split(",") if c.strip()]
        order = []
        for part in sort_spec.split(","):
            fld, _, direction = part.strip().partition(" ")
            order.append(F.col(fld).desc()
                         if direction.strip().lower() == "desc"
                         else F.col(fld).asc())
        base = doc_attrs
        if rest and rest.strip() and rest.strip() != "*:*":
            hits = searcher.matches(
                A.parse_query(rest.strip())).select("docid")
            base = base.join(hits, "docid")
        out_cols = ["docid"] + [c for c in cols if c != "docid"]
        return sort_stream(base.select(*out_cols), order)
    if name == "payload_score":
        # PayloadScoreQParserPlugin.java: {!payload_score f=text
        # func=max includeSpanScore=false}term — the payload ints come
        # from the .pay-analogue stream (offset payloads,
        # TokenOffsetPayloadTokenFilter shape; see ast.PayloadScoreQ).
        field = params.get("f", "text")
        if field != "text":
            raise ValueError(f"unknown field {field!r}")
        term = (params.get("v", rest) or "").strip().lower()
        if not term:
            raise ValueError("{!payload_score} needs a term")
        q = A.PayloadScoreQ(
            term, func=params.get("func", "max").lower(),
            include_span_score=(params.get("includeSpanScore", "false")
                                .lower() == "true"))
        return searcher.matches(q)
    if name == "payload_check":
        # PayloadCheckQParserPlugin.java: {!payload_check f=text
        # payloads='0 5'}hash join — keep only the spans whose
        # per-position payloads equal the list (SpanPayloadCheckQuery;
        # payload ints come from the same .pay-analogue stream as
        # {!payload_score}: offset payloads, so '0' pins the span to
        # the document start).
        field = params.get("f", "text")
        if field != "text":
            raise ValueError(f"unknown field {field!r}")
        body = (params.get("v", rest) or "").strip().lower()
        terms = tuple(t for t in body.split() if t)
        pstr = (params.get("payloads", "") or "").strip()
        if not terms or not pstr:
            raise ValueError("{!payload_check} needs span terms and "
                             "payloads")
        pays = tuple(int(float(x)) for x in pstr.split())
        return searcher.matches(A.SpanPayloadCheckQ(terms, pays))
    if name == "tlogit":
        # TextLogisticRegressionQParserPlugin.java (the train()
        # streaming expression's per-iteration trainer): docs
        # containing >= 1 feature term get the vector
        # [1, idf_i * (1 + ln tf_i) ...]; one logistic-regression
        # step + |error| sum + confusion counts against the incoming
        # weights. DEVIATION (documented): the reference updates
        # weights per doc in HashMap iteration order — nondeterministic
        # even single-node — so the Spark version takes the BATCH
        # gradient step (all errors against the incoming weights),
        # which is deterministic and distribution-friendly; totalError
        # and the evaluation counts match the reference exactly (it
        # computes them against the incoming weights too).
        if doc_attrs is None:
            raise ValueError("{!tlogit} needs a doc_attrs frame "
                             "(docid, outcome)")
        terms = [t for t in params["terms"].split(",") if t]
        idfs = [float(x) for x in params["idfs"].split(",")]
        if len(idfs) != len(terms):
            raise ValueError("terms/idfs length mismatch")
        n_w = len(terms) + 1
        w_in = ([float(x) for x in params["weights"].split(",")]
                if "weights" in params else [1.0] * n_w)
        if len(w_in) != n_w:
            raise ValueError("weights must have len(terms)+1 entries")
        alpha = float(params.get("alpha", 0.01))
        threshold = float(params.get("threshold", 0.5))
        positive = int(params.get("positiveLabel", 1))

        base = doc_attrs.select(
            "docid",
            (F.col("outcome").cast("int") == positive).cast("double")
            .alias("_y"))
        feats = base
        for i, t in enumerate(terms):
            tf = (searcher.index.postings.where(F.col("term") == t)
                  .select("docid", F.col("tf").alias(f"_tf{i}")))
            feats = feats.join(tf, "docid", "left")
        fcols = [F.when(F.col(f"_tf{i}").isNotNull(),
                        F.lit(idfs[i])
                        * (F.lit(1.0)
                           + F.log(F.col(f"_tf{i}").cast("double"))))
                 .otherwise(F.lit(0.0)) for i in range(len(terms))]
        # docVectors membership: docs with at least one feature term
        any_t = F.greatest(*[F.col(f"_tf{i}").isNotNull().cast("int")
                             for i in range(len(terms))]) == 1 \
            if terms else F.lit(False)
        feats = feats.where(any_t)
        z = F.lit(w_in[0])
        for i, fc in enumerate(fcols):
            z = z + fc * F.lit(w_in[i + 1])
        sig = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        err = sig - F.col("_y")
        pred = (sig >= F.lit(threshold)).cast("int")
        aggs = [F.sum(F.abs(err)).alias("error"),
                F.sum(err).alias("g0")]
        aggs += [F.sum(err * fc).alias(f"g{i + 1}")
                 for i, fc in enumerate(fcols)]
        aggs += [
            F.sum(((F.col("_y") == 1.0) & (pred == 1)).cast("long"))
            .alias("tp"),
            F.sum(((F.col("_y") == 0.0) & (pred == 1)).cast("long"))
            .alias("fp"),
            F.sum(((F.col("_y") == 1.0) & (pred == 0)).cast("long"))
            .alias("fn"),
            F.sum(((F.col("_y") == 0.0) & (pred == 0)).cast("long"))
            .alias("tn"),
        ]
        row = feats.agg(*aggs).collect()[0]
        out = [("error", float(row["error"] or 0.0))]
        for i in range(n_w):
            out.append((f"w_{i}",
                        w_in[i] - alpha * float(row[f"g{i}"] or 0.0)))
        for m in ("tp", "fp", "fn", "tn"):
            out.append((m, float(row[m] or 0)))
        return searcher.index.docs.sparkSession.createDataFrame(
            out, "name string, value double")
    raise ValueError(f"unknown QParser dialect {name!r}")


# ---- SimpleQueryParser subset ----------------------------------------------

def _parse_simple(s: str, default_op: str = "OR") -> "A.Query":
    """queryparser/simple/SimpleQueryParser.java subset, with the
    reference's LEFT-TO-RIGHT combination (buildQueryTree,
    SimpleQueryParser.java:435-477): clauses fold into the running
    tree as they arrive — same operator appends FLAT to the current
    BooleanQuery, an operator CHANGE wraps the accumulated tree as a
    single clause of a new one (no precedence between + and |). A
    negated branch becomes (MatchAll MUST_NOT branch) and joins the
    tree as a regular clause, so purely-negative queries are valid.
    Tokens: terms / "phrases"~N / trailing-* prefixes / term~N
    fuzzies / parenthesized groups; whitespace = the q.op default."""
    toks = re.findall(r'"[^"]*"(?:~\d+)?|[()|+]|(?<![^\s(])-|[^\s()|+]+',
                      s)

    def leaf(t: str) -> "A.Query":
        if t.startswith('"'):
            m = re.fullmatch(r'"([^"]*)"(?:~(\d+))?', t)
            terms = tuple(w.lower() for w in m.group(1).split())
            slop = int(m.group(2)) if m.group(2) else 0
            return A.PhraseQ(terms, slop=slop)
        if t.endswith("*") and len(t) > 1:
            return A.PrefixQ(t[:-1].lower())
        fm = re.fullmatch(r"([^~]+)~(\d+)", t)
        if fm:
            return A.FuzzyQ(fm.group(1).lower(),
                            max_edits=int(fm.group(2)))
        return A.TermQ(t.lower())

    def parse_seq(pos: int) -> tuple["A.Query", int]:
        top = None
        prev_op = None
        cur_op = None
        neg = False
        while pos < len(toks) and toks[pos] != ")":
            t = toks[pos]
            if t == "|":
                cur_op = "OR"
                pos += 1
                continue
            if t == "+":
                cur_op = "AND"
                pos += 1
                continue
            if t == "-":
                neg = not neg
                pos += 1
                continue
            if t == "(":
                branch, pos = parse_seq(pos + 1)
                if pos < len(toks) and toks[pos] == ")":
                    pos += 1
            else:
                branch = leaf(t)
                pos += 1
            if neg:
                branch = A.NotQ(A.MatchAllQ(), branch)
                neg = False
            if top is None:
                top = branch
            else:
                if cur_op is None:
                    cur_op = default_op
                cls = A.AndQ if cur_op == "AND" else A.OrQ
                if prev_op == cur_op and isinstance(top, cls):
                    top = cls(top.clauses + (branch,))
                else:
                    top = cls((top, branch))
                prev_op = cur_op
            cur_op = None
        if top is None:
            raise ValueError("empty {!simple} query")
        return top, pos

    node, pos = parse_seq(0)
    if pos != len(toks):
        raise ValueError(f"trailing tokens at {pos}: {toks[pos:]}")
    return node


# ---- XML query parser (CoreParser subset) ----------------------------------

def parse_xml_query(xml: str) -> "A.Query":
    """queryparser/xml/CoreParser.java subset: TermQuery /
    BooleanQuery (Clause occurs=must|should|mustNot) / PhraseQuery /
    MatchAllDocsQuery / DisjunctionMaxQuery / ConstantScoreQuery /
    PrefixQuery / SpanNear(two SpanTerm children) elements map onto
    the engine AST. The fieldName attribute must be 'text' (the
    engine's single analyzed field) when present."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(xml)
    return _xml_node(root)


def _xml_field(el) -> None:
    f = el.get("fieldName", "text")
    if f != "text":
        raise ValueError(f"unknown field {f!r}")


def _xml_node(el) -> "A.Query":
    tag = el.tag
    boost = float(el.get("boost", 1.0))
    if tag == "TermQuery":
        _xml_field(el)
        return A.TermQ(el.text.strip().lower(), boost=boost)
    if tag == "PrefixQuery":
        _xml_field(el)
        return A.PrefixQ(el.text.strip().lower(), boost=boost)
    if tag == "PhraseQuery":
        _xml_field(el)
        slop = int(el.get("slop", 0))
        terms = tuple(w.lower() for w in el.text.strip().split())
        return A.PhraseQ(terms, slop=slop, boost=boost)
    if tag == "MatchAllDocsQuery":
        return A.MatchAllQ()
    if tag == "ConstantScoreQuery":
        return A.ConstQ(_xml_node(el[0]), boost=boost)
    if tag == "DisjunctionMaxQuery":
        if boost != 1.0:
            raise ValueError("DisjunctionMaxQuery boost is not "
                             "supported (DisMaxQ carries no boost)")
        tie = float(el.get("tieBreaker", 0.0))
        return A.DisMaxQ(tuple(_xml_node(c) for c in el),
                         tie_breaker=tie)
    if tag == "BooleanQuery":
        must, should, neg = [], [], []
        for cl in el:
            if cl.tag != "Clause":
                raise ValueError(f"expected Clause, got {cl.tag}")
            occurs = cl.get("occurs", "should")
            node = _xml_node(cl[0])
            if occurs == "filter":
                # FILTER constrains matches but contributes NO score
                # (BooleanClause.Occur.FILTER): a zero-boost constant
                # wrapper joins the conjunction adding 0.0
                node = A.ConstQ(node, boost=0.0)
                occurs = "must"
            {"must": must, "should": should,
             "mustNot": neg}[occurs].append(node)
        if must and should:
            base = A.ReqOptQ(
                must[0] if len(must) == 1 else A.AndQ(tuple(must)),
                should[0] if len(should) == 1 else A.OrQ(tuple(should)))
        elif must:
            base = must[0] if len(must) == 1 else A.AndQ(tuple(must))
        elif should:
            base = should[0] if len(should) == 1 else A.OrQ(tuple(should))
        else:
            raise ValueError("BooleanQuery needs a positive clause")
        for n in neg:
            base = A.NotQ(base, n)
        return base
    if tag == "SpanNear":
        kids = list(el)
        if len(kids) != 2 or any(k.tag != "SpanTerm" for k in kids):
            raise ValueError("SpanNear subset: exactly two SpanTerm "
                             "children")
        for k in kids:
            _xml_field(k)
        return A.SpanNearQ(kids[0].text.strip().lower(),
                           kids[1].text.strip().lower(),
                           slop=int(el.get("slop", 0)),
                           in_order=el.get("inOrder", "true") == "true")
    raise ValueError(f"unknown XML query element {tag!r}")


def _empty(searcher) -> DataFrame:
    return (searcher.index.docs.select("docid")
            .where(F.lit(False)).withColumn("score", F.lit(0.0)))
