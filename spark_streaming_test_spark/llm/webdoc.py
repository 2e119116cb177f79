"""Web-document operators: HTML visible-text extraction and robots.txt
crawl filtering — the layer between a crawl (WARC records) and a text
corpus (the documents table).

HTML extraction is the load-bearing step of every web-crawl pipeline:
strip markup, DROP invisible content (``<script>``/``<style>`` bodies
— each fixture page embeds a decoy string there that must NOT leak
into the text), decode character entities, and count the structural
signals quality filters use (links, paragraphs, text-to-markup
ratio). Built on the stdlib ``html.parser`` state machine.

Unlike the file-fixture sources, these operators run over the
``documents`` TABLE: each document is wrapped into a deterministic
page (title + two paragraphs + anchor + script decoy) with built-in
string functions JVM-side, and the extractor recovers the original
words — so the operator scales with the scale factor and the DuckDB
oracle recomputes everything from ``documents.text`` directly, the
same encode-with-builtins / decode-under-test shape as the Kafka wire
roundtrip queries.

robots.txt filtering uses the stdlib ``urllib.robotparser`` against
per-source policies, the decision a crawler makes before a URL ever
reaches the corpus.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load, spread
from ..registry import register

# --- page synthesis (JVM-side builtins) ---------------------------------------


def _page_html(doc_id, text):
    """Deterministic page around a document: title with an entity,
    script decoy, two paragraphs split mid-text, one anchor."""
    toks = F.split(text, " ")
    n = F.size(toks)
    k = F.ceil(n / F.lit(2)).cast("int")
    first = F.array_join(F.slice(toks, F.lit(1), k), " ")
    second = F.array_join(
        F.slice(toks, k + 1, F.greatest(n - k, F.lit(0))), " "
    )
    return F.concat(
        F.lit("<html><head><title>doc "),
        doc_id.cast("string"),
        F.lit(" &amp; friends</title><script>var decoy = \"DO NOT EXTRACT "),
        doc_id.cast("string"),
        F.lit("\";</script><style>p { color: red; }</style></head><body><p>"),
        first,
        F.lit('</p><p><a href="http://l.example/'),
        doc_id.cast("string"),
        F.lit('">go</a> '),
        second,
        F.lit("</p></body></html>"),
    )


# --- extractor (html.parser state machine) -------------------------------------


def extract_html(html: str) -> dict:
    """Visible text + structure: script/style bodies dropped, entities
    decoded (convert_charrefs), text nodes whitespace-normalized and
    space-joined in document order."""
    from html.parser import HTMLParser

    class _X(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=True)
            self.skip_depth = 0
            self.in_title = False
            self.title_parts: list[str] = []
            self.text_parts: list[str] = []
            self.n_links = 0
            self.n_paragraphs = 0
            self.dropped_chars = 0

        def handle_starttag(self, tag, attrs):
            if tag in ("script", "style", "noscript"):
                self.skip_depth += 1
            elif tag == "title":
                self.in_title = True
            elif tag == "a":
                self.n_links += 1
            elif tag == "p":
                self.n_paragraphs += 1

        def handle_endtag(self, tag):
            if tag in ("script", "style", "noscript") and self.skip_depth:
                self.skip_depth -= 1
            elif tag == "title":
                self.in_title = False

        def handle_data(self, data):
            if self.skip_depth:
                self.dropped_chars += len(data)
                return
            words = data.split()
            if not words:
                return
            if self.in_title:
                self.title_parts.extend(words)
            else:
                self.text_parts.extend(words)

    x = _X()
    x.feed(html)
    x.close()
    return {
        "title": " ".join(x.title_parts),
        "text": " ".join(x.text_parts),
        "n_links": x.n_links,
        "n_paragraphs": x.n_paragraphs,
        "dropped_chars": x.dropped_chars,
    }


@register(
    "html_extract_text",
    tags=("llm", "curation", "text", "pandas-udf"),
    # Oracle invariant: documents.text is single-spaced with no
    # leading/trailing whitespace (the datagen emits space-joined word
    # lists), so splitting on ' ' yields no empty tokens and the
    # halves re-join losslessly. The trim() below covers the one
    # departure the extractor would still normalize — an empty second
    # half (single-token doc) leaving a trailing space after ' go '.
    # test_round9b_ops.py::test_documents_text_single_spaced_invariant
    # pins the corpus invariant itself.
    oracle="""
WITH d AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks,
         length(text) AS raw_len
  FROM documents
),
split_ AS (
  SELECT doc_id, raw_len,
         CAST(ceil(len(toks) / 2.0) AS BIGINT) AS k, toks
  FROM d
),
parts AS (
  SELECT doc_id, raw_len,
         array_to_string(toks[1 : k], ' ') AS first_half,
         array_to_string(toks[k + 1 : len(toks)], ' ') AS second_half
  FROM split_
)
SELECT doc_id,
       'doc ' || CAST(doc_id AS VARCHAR) || ' & friends' AS title,
       trim(first_half || ' go ' || second_half) AS text,
       1 AS n_links,
       2 AS n_paragraphs,
       CAST(length(trim(first_half || ' go ' || second_half)) AS BIGINT)
         AS text_len,
       length('DO NOT EXTRACT ' || CAST(doc_id AS VARCHAR)) > 0 AS decoy_dropped
FROM parts
""",
)
def html_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wrap every document into a real HTML page (JVM-side builtins),
    then extract the visible text back with the html.parser state
    machine: title with a decoded ``&amp;`` entity, two paragraphs
    rejoined around the anchor text, script/style decoys DROPPED (the
    boolean pins that nonzero invisible chars were seen and excluded
    — a regex-strip extractor that leaks script bodies fails the
    text hash). The oracle rebuilds the expected extraction from
    ``documents.text`` directly.

    Scale: one Arrow-batched pass, no shuffle at all — page synthesis
    and extraction are both per-row."""
    d = spread(load(spark, sf_dir, "documents"))
    pages = d.select(
        "doc_id", _page_html(F.col("doc_id"), F.col("text")).alias("html")
    )

    @F.pandas_udf(
        "title string, text string, n_links int, n_paragraphs int, "
        "dropped_chars int"
    )
    def _extract(html: pd.Series) -> pd.DataFrame:
        rows = [extract_html(h) for h in html]
        return pd.DataFrame(
            {
                "title": [r["title"] for r in rows],
                "text": [r["text"] for r in rows],
                "n_links": [r["n_links"] for r in rows],
                "n_paragraphs": [r["n_paragraphs"] for r in rows],
                "dropped_chars": [r["dropped_chars"] for r in rows],
            }
        )

    out = pages.withColumn("r", _extract(F.col("html")))
    return out.select(
        "doc_id",
        F.col("r.title").alias("title"),
        F.col("r.text").alias("text"),
        F.col("r.n_links").alias("n_links"),
        F.col("r.n_paragraphs").alias("n_paragraphs"),
        F.length("r.text").cast("bigint").alias("text_len"),
        (F.col("r.dropped_chars") > 0).alias("decoy_dropped"),
    )


# --- robots.txt filtering ------------------------------------------------------

ROBOTS_DISALLOW_MOD = 17  # URL path bucket count


def _robots_txt(source: str) -> str:
    """Deterministic per-source policy: sources ending in an odd digit
    disallow path buckets 3, 7 and 11; even sources disallow the /p/0
    bucket and everything under /private/."""
    tail = int(source[-1]) if source[-1].isdigit() else 0
    if tail % 2 == 1:
        rules = ["Disallow: /p/3", "Disallow: /p/7", "Disallow: /p/11"]
    else:
        rules = ["Disallow: /p/0", "Disallow: /private/"]
    return "User-agent: *\n" + "\n".join(rules) + "\n"


@register(
    "corpus_robots_filter",
    tags=("llm", "curation"),
    oracle=f"""
WITH d AS (
  SELECT doc_id, source, doc_id % {ROBOTS_DISALLOW_MOD} AS bucket,
         COALESCE(TRY_CAST(regexp_extract(source, '(\\d)$', 1) AS INTEGER), 0)
           % 2 = 1 AS odd_source
  FROM documents
)
SELECT doc_id, source,
       'http://' || source || '.example/p/' || CAST(bucket AS VARCHAR)
         AS url,
       NOT (CASE WHEN odd_source THEN bucket IN (3, 7, 11)
                 ELSE bucket = 0 END) AS allowed
FROM d
""",
)
def corpus_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-permission filtering with the stdlib robots.txt parser:
    each source publishes a deterministic policy, every document URL
    is checked with ``urllib.robotparser`` (exact-prefix Disallow
    matching per the original 1994 spec), and the oracle recomputes
    the allow/deny decision from the policy's closed form — so the
    parser's prefix semantics are what's being hash-pinned, not
    string arithmetic.

    Scale: policies are per-source (a handful), parsed once per Arrow
    batch and memoized; the URL check is per-row with no shuffle."""
    d = spread(load(spark, sf_dir, "documents"))

    @F.pandas_udf("boolean")
    def _allowed(source: pd.Series, url: pd.Series) -> pd.Series:
        import urllib.robotparser as rp

        cache: dict[str, rp.RobotFileParser] = {}
        out = []
        for s, u in zip(source, url):
            parser = cache.get(s)
            if parser is None:
                parser = rp.RobotFileParser()
                parser.parse(_robots_txt(s).splitlines())
                cache[s] = parser
            out.append(parser.can_fetch("*", u))
        return pd.Series(out)

    urls = d.select(
        "doc_id",
        "source",
        F.concat(
            F.lit("http://"),
            F.col("source"),
            F.lit(".example/p/"),
            (F.col("doc_id") % ROBOTS_DISALLOW_MOD).cast("string"),
        ).alias("url"),
    )
    return urls.select(
        "doc_id",
        "source",
        "url",
        _allowed(F.col("source"), F.col("url")).alias("allowed"),
    )
