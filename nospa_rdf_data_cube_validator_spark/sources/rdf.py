"""RDF sources and sinks for the canonical triples DataFrame.

Reference operator S1 parses one of the RDF serializations picked by file
extension into the in-memory model (Main.java:23-43,
nonsparql/NospaValidator.java:41-48); S2 serializes the model back
(NospaValidator.java:56-67). Spark-first mapping (SURVEY.md §2.1):

- **N-Triples** is line-oriented, so it is the *distributed* path:
  ``spark.read.text`` + an Arrow-vectorized pandas UDF regex parser. This
  is the format to use at 100 TB — it splits by line across executors.
- **Turtle** (the golden fixture's format) is parsed on the driver by a
  small subset parser (prefixes, ';'/',' lists, '[]' bnodes, typed/lang
  literals, numbers, booleans, 'a'); fine for schema-scale files, not for
  bulk data. There is no rdflib in this environment, so the parser is
  self-contained.
- Sinks: parquet (the at-rest layout, pred-partitionable) and N-Triples
  text (interchange).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import qb, terms

# --------------------------------------------------------------------------
# N-Triples: distributed parse
# --------------------------------------------------------------------------
_NT_LINE = re.compile(
    r"^\s*"
    r"(?:<(?P<s_iri>[^>]*)>|(?P<s_bn>_:\S+))\s+"
    r"<(?P<p>[^>]*)>\s+"
    r"(?:<(?P<o_iri>[^>]*)>"
    r"|(?P<o_bn>_:\S+)"
    r'|"(?P<o_lit>(?:[^"\\]|\\.)*)"'
    r"(?:\^\^<(?P<o_dt>[^>]*)>|@(?P<o_lang>[A-Za-z0-9-]+))?"
    r")\s*\.\s*$"
)

_UNESC = {
    "\\n": "\n",
    "\\r": "\r",
    "\\t": "\t",
    '\\"': '"',
    "\\\\": "\\",
}
_ESC_RE = re.compile(r'\\(?:[ntr"\\]|u[0-9A-Fa-f]{4}|U[0-9A-Fa-f]{8})')


def _unescape(s: str) -> str:
    def sub(m: re.Match) -> str:
        tok = m.group(0)
        if tok in _UNESC:
            return _UNESC[tok]
        return chr(int(tok[2:], 16))

    return _ESC_RE.sub(sub, s)


def _parse_nt_batch(lines: pd.Series, on_malformed: str = "raise") -> pd.DataFrame:
    out = {c: [] for c in terms.TRIPLE_COLS}
    for line in lines:
        if not line or line.lstrip().startswith("#"):
            continue
        m = _NT_LINE.match(line)
        if not m:
            # Jena (the reference's parser, Main.java:23-43) fails loudly on
            # malformed input; silently dropping lines would mask data loss.
            if on_malformed == "raise":
                raise ValueError(f"malformed N-Triples line: {line[:200]!r}")
            continue
        g = m.groupdict()
        subj = g["s_iri"] if g["s_iri"] is not None else g["s_bn"]
        pred = g["p"]
        if g["o_iri"] is not None:
            obj, kind, dt, lang = g["o_iri"], terms.KIND_IRI, None, None
        elif g["o_bn"] is not None:
            obj, kind, dt, lang = g["o_bn"], terms.KIND_BNODE, None, None
        else:
            lex = _unescape(g["o_lit"])
            dt, lang = g["o_dt"], g["o_lang"]
            obj, kind = terms.encode_literal(lex, dt or "", lang or ""), terms.KIND_LITERAL
        out["subj"].append(subj)
        out["pred"].append(pred)
        out["obj"].append(obj)
        out["obj_kind"].append(kind)
        out["obj_datatype"].append(dt)
        out["obj_lang"].append(lang)
    return pd.DataFrame(out)


def read_ntriples(spark: SparkSession, path: str, on_malformed: str = "raise") -> DataFrame:
    """Distributed N-Triples reader: text lines -> triples DF (dedup'd).

    on_malformed: 'raise' (default — Jena parity, the job fails with the
    offending line in the error) or 'drop' (permissive mode for scrubbing
    known-dirty dumps; rejected lines are dropped)."""
    if on_malformed not in ("raise", "drop"):
        raise ValueError(f"on_malformed must be 'raise' or 'drop', got {on_malformed!r}")
    raw = spark.read.text(path)

    def gen(batches):
        for pdf in batches:
            yield _parse_nt_batch(pdf["value"], on_malformed)

    parsed = raw.mapInPandas(gen, schema=terms.TRIPLES_SCHEMA)
    return parsed.dropDuplicates(["subj", "pred", "obj"])


# --------------------------------------------------------------------------
# Turtle subset: driver-side parse (schema-scale files)
# --------------------------------------------------------------------------
_TTL_TOKEN = re.compile(
    r"""
      (?P<comment>\#[^\n]*)
    | (?P<prefix_decl>@prefix|@base|PREFIX|BASE)
    | (?P<iri><[^>]*>)
    | (?P<literal>"(?:[^"\\]|\\.)*"(?:\^\^(?:<[^>]*>|[A-Za-z][\w.-]*:[\w.-]*)|@[A-Za-z0-9-]+)?)
    | (?P<bnode>_:[\w.-]+)
    | (?P<punct>[;,.\[\]()])
    | (?P<kw_a>\ba\b)
    | (?P<boolean>\btrue\b|\bfalse\b)
    | (?P<number>[+-]?\d+\.\d+(?:[eE][+-]?\d+)?|[+-]?\d+[eE][+-]?\d+|[+-]?\d+)
    | (?P<pname>[A-Za-z][\w.-]*)?:(?:[\w.%-]|\\.)*
    """,
    re.VERBOSE,
)


class _TurtleParser:
    """Subset Turtle parser sufficient for W3C-example-class cubes
    (everything in /root/reference/test.ttl): prefixed names, object and
    predicate lists, anonymous bnodes, typed/lang literals, numerics and
    booleans. Not a full spec implementation — bulk data belongs in
    N-Triples/parquet anyway."""

    def __init__(self, text: str):
        self.tokens = self._tokenize(text)
        self.pos = 0
        self.prefixes: dict[str, str] = {}
        self.rows: list[tuple] = []
        self._bnode_n = 0

    @staticmethod
    def _tokenize(text: str) -> list[str]:
        toks = []
        for m in _TTL_TOKEN.finditer(text):
            if m.lastgroup == "comment":
                continue
            toks.append(m.group(0))
        return toks

    def _peek(self):
        return self.tokens[self.pos] if self.pos < len(self.tokens) else None

    def _next(self):
        tok = self._peek()
        self.pos += 1
        return tok

    def _fresh_bnode(self) -> str:
        self._bnode_n += 1
        return f"_:anon{self._bnode_n}"

    def _expand(self, tok: str) -> str:
        if tok.startswith("<"):
            return tok[1:-1]
        pfx, _, local = tok.partition(":")
        base = self.prefixes.get(pfx)
        if base is None:
            raise ValueError(f"unknown prefix in {tok!r}")
        return base + local

    def parse(self) -> list[tuple]:
        while (tok := self._peek()) is not None:
            if tok in ("@prefix", "PREFIX"):
                self._next()
                pname = self._next()
                iri = self._next()
                self.prefixes[pname.rstrip(":").split(":")[0]] = iri[1:-1]
                if tok == "@prefix":
                    assert self._next() == "."
            elif tok in ("@base", "BASE"):
                self._next()
                self._next()
                if tok == "@base":
                    assert self._next() == "."
            else:
                subj = self._parse_node_as_subject()
                self._parse_predicate_object_list(subj)
                assert self._next() == ".", "statement must end with '.'"
        return self.rows

    def _parse_node_as_subject(self) -> str:
        tok = self._next()
        if tok == "[":
            subj = self._fresh_bnode()
            if self._peek() != "]":
                self._parse_predicate_object_list(subj)
            assert self._next() == "]"
            return subj
        if tok.startswith("_:") or tok.startswith("<") or ":" in tok:
            return tok if tok.startswith("_:") else self._expand(tok)
        raise ValueError(f"unexpected subject token {tok!r}")

    def _parse_predicate_object_list(self, subj: str) -> None:
        while True:
            ptok = self._next()
            if ptok == "a":
                pred = qb.RDF_TYPE
            else:
                pred = self._expand(ptok)
            self._parse_object_list(subj, pred)
            nxt = self._peek()
            if nxt == ";":
                self._next()
                # tolerate trailing ';' before '.' or ']'
                if self._peek() in (".", "]", None):
                    return
                continue
            return

    def _parse_object_list(self, subj: str, pred: str) -> None:
        while True:
            self._parse_object(subj, pred)
            if self._peek() == ",":
                self._next()
                continue
            return

    def _parse_object(self, subj: str, pred: str) -> None:
        tok = self._next()
        if tok == "[":
            node = self._fresh_bnode()
            self.rows.append(terms.bnode_row(subj, pred, node))
            if self._peek() != "]":
                self._parse_predicate_object_list(node)
            assert self._next() == "]"
            return
        if tok.startswith("_:"):
            self.rows.append(terms.bnode_row(subj, pred, tok))
            return
        if tok.startswith('"'):
            m = re.match(
                r'^"(?P<lex>(?:[^"\\]|\\.)*)"(?:\^\^(?P<dt><[^>]*>|[A-Za-z][\w.-]*:[\w.-]*)|@(?P<lang>[A-Za-z0-9-]+))?$',
                tok,
            )
            lex = _unescape(m.group("lex"))
            dt = m.group("dt")
            if dt:
                dt = dt[1:-1] if dt.startswith("<") else self._expand(dt)
            self.rows.append(terms.lit_row(subj, pred, lex, dt or "", m.group("lang") or ""))
            return
        if tok in ("true", "false"):
            self.rows.append(terms.lit_row(subj, pred, tok, qb.XSD_BOOLEAN))
            return
        if re.match(r"^[+-]?\d+$", tok):
            self.rows.append(terms.lit_row(subj, pred, tok, qb.PREFIX_XSD + "integer"))
            return
        if re.match(r"^[+-]?\d+\.\d+$", tok):
            self.rows.append(terms.lit_row(subj, pred, tok, qb.XSD_DECIMAL))
            return
        if re.match(r"^[+-]?(\d+\.?\d*|\.\d+)[eE][+-]?\d+$", tok):
            self.rows.append(terms.lit_row(subj, pred, tok, qb.PREFIX_XSD + "double"))
            return
        self.rows.append(terms.iri_row(subj, pred, self._expand(tok)))


def read_turtle(spark: SparkSession, path: str) -> DataFrame:
    with open(path, encoding="utf-8") as fh:
        rows = _TurtleParser(fh.read()).parse()
    return terms.triples_df(spark, rows)


def read_rdf(spark: SparkSession, path: str, fmt: str | None = None) -> DataFrame:
    """Extension-dispatch reader (Main.java:23-43 equivalent).

    .nt/.ntriples -> distributed N-Triples; .ttl/.n3 -> driver Turtle
    subset; .parquet -> canonical at-rest layout. RDF/XML is not
    implemented (no spec-complete XML RDF parser is warranted here —
    convert upstream)."""
    fmt = (fmt or path.rsplit(".", 1)[-1]).lower()
    if fmt in ("nt", "ntriple", "ntriples", "n-triple"):
        return read_ntriples(spark, path)
    if fmt in ("ttl", "turtle", "n3"):
        return read_turtle(spark, path)
    if fmt == "parquet":
        return spark.read.parquet(path)
    raise NotImplementedError(f"RDF format {fmt!r} not supported (use nt/ttl/parquet)")


# --------------------------------------------------------------------------
# Sinks (S2)
# --------------------------------------------------------------------------
def write_parquet(triples: DataFrame, path: str, mode: str = "overwrite") -> None:
    """At-rest layout: parquet. ``pred`` is the natural partition/cluster
    key (emulates Jena's POS index via partition pruning), but with dynamic
    predicates we keep it a plain sorted column so min/max row-group stats
    prune instead of creating unbounded directories."""
    triples.sortWithinPartitions("pred", "subj").write.mode(mode).parquet(path)


def write_ntriples(triples: DataFrame, path: str, mode: str = "overwrite") -> None:
    line = F.concat_ws(
        " ",
        terms.ntriples_term_res("subj"),
        F.concat(F.lit("<"), F.col("pred"), F.lit(">")),
        terms.ntriples_term_obj(),
        F.lit("."),
    )
    triples.select(line.alias("value")).write.mode(mode).text(path)
