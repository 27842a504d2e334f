"""Link extraction and host-graph operators — pure JVM expressions.

Web-scale pipelines need the link graph (PageRank-style signals, spam
domain filtering, crawl frontier building) as much as the text. Extraction
here is a codegen regexp over the decoded html (`regexp_extract_all`), not
a Python pass: at 100 TB the difference between a JVM regex and an Arrow
round-trip is the whole job cost. The deliberately simple double-quoted
`href="..."` pattern is engine-portable (Java regex == RE2 == DuckDB), so
the driver verifies extraction with a planted-value SQL oracle; the full
tolerant parse (unquoted/single-quoted attrs) belongs to the block kernel
if ever needed for correctness-critical use.

Graph building is scan -> explode -> groupBy: one shuffle keyed by host
pair, no UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

HREF_PATTERN = r'href="([^"]+)"'


def decoded_html(col: Column) -> Column:
    """binary html -> string for JVM regex work. UTF-8 with U+FFFD
    replacement (same policy as the kernel's default path) — NOT
    decode(col,'UTF-8'), which THROWS on malformed bytes in Spark 4 and
    would kill the job on the first latin-1 page; cast(binary as string)
    is the lenient codegen path."""
    return col.cast("string")


def extract_hrefs(html_str: Column) -> Column:
    """All double-quoted href values, in document order (JVM codegen)."""
    return F.regexp_extract_all(html_str, F.lit(HREF_PATTERN), F.lit(1))


ANCHOR_PATTERN = r"(?i)<a\s[^>]*>"
# \s-anchored attribute probes: without the boundary, data-rel="nofollow"
# reads as rel= and data-href= as href= (first-match extraction would then
# pull the wrong url entirely)
NOFOLLOW_PATTERN = r'(?i)\srel="[^"]*nofollow[^"]*"'


def extract_anchor_links(html_str: Column) -> Column:
    """Array of (href, nofollow) structs for every double-quoted-href
    anchor open tag, in document order. rel="nofollow" awareness is the
    crawl-hygiene semantic the bare href extractor lacks: nofollow edges
    carry no endorsement, so PageRank-style signals and frontier builders
    must be able to drop them. Same engine-portable regexp discipline as
    HREF_PATTERN (anchor tags found with one regexp_extract_all; per-tag
    href/rel probes run over short tag strings, not the whole document)."""
    # attr probes are (?i) to match the tag scan (legacy pages shout
    # <A HREF=...>) and \s-anchored against data-href= lookalikes; the
    # document-level extract_hrefs keeps the stricter lowercase contract
    # its planted oracle pins
    href_ci = r"(?i)\s" + HREF_PATTERN
    tags = F.regexp_extract_all(html_str, F.lit(ANCHOR_PATTERN), F.lit(0))
    with_href = F.filter(tags, lambda t: t.rlike(href_ci))
    return F.transform(with_href, lambda t: F.struct(
        F.regexp_extract(t, href_ci, 1).alias("href"),
        t.rlike(NOFOLLOW_PATTERN).alias("nofollow")))


def filter_blocklisted_hosts(df: DataFrame, blocklist: DataFrame,
                             url_col: str = "url",
                             host_col: str = "host") -> DataFrame:
    """Drop rows whose url host appears in the blocklist — the spam-/
    adult-domain gate every crawl curation pipeline runs (UT1-style lists
    are ~MB scale). The blocklist is lowercased, distinct-ed, and
    BROADCAST into a left-anti hash join, so the corpus side never
    shuffles; schema is preserved.

    Join-key hygiene: the gate keys on the bare registrable host — url
    USERINFO ('x@spam.example') and ANY port (':8080', not just the
    defaults) are stripped on both sides, because a spam gate that a
    one-character url variant evades is not a gate (ports select a
    service on the same host; blocking is per-host). Empty hosts are
    excluded from the list side (a stray blank line in a real-world list
    file would otherwise silently drop every relative/non-http-url row,
    whose host key is '')."""
    key = "_bl_host"
    while key in df.columns:  # never clobber a caller column
        key += "_"

    def gate_key(c):
        return F.regexp_replace(
            F.regexp_replace(F.lower(c), r"^[^@/]*@", ""),
            r"(:\d+)+$", "")

    bl = (blocklist.select(gate_key(F.col(host_col)).alias(key))
          .filter(F.col(key) != "")
          .distinct())
    return (df.withColumn(key, gate_key(host_of(F.col(url_col))))
            .join(F.broadcast(bl), key, "left_anti")
            .drop(key))


def host_quality_stats(df: DataFrame, url_col: str = "url",
                       text_col: str = "text") -> DataFrame:
    """Domain-reputation aggregate: per host — document count, quality-gate
    keep count, and integer-exact quality sums (tokens, mwl_x100, stopword
    hits). One groupBy shuffle whose partial aggregates collapse per host
    map-side, so the exchange carries one row per (partition, host) — the
    output is bounded by the domain universe, not corpus rows. All sums
    are integers (Arrow/oracle-exact; no float means — consumers divide)."""
    from llmap_spark.operators.textstats import quality_features

    q = quality_features(df, text_col=text_col)
    return (q.withColumn("host", host_of(F.col(url_col)))
            .groupBy("host")
            # NULL-text docs carry NULL quality columns; coalesce BEFORE
            # summing or an all-NULL-text host aggregates n_keep = NULL
            # and slips through reputation_blocklist's integer filter —
            # a 0%-keep host escaping the very gate built to catch it
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.coalesce(F.col("q_keep").cast("int"), F.lit(0)))
                 .cast("bigint").alias("n_keep"),
                 F.sum(F.coalesce("n_tokens_t", F.lit(0)))
                 .cast("bigint").alias("sum_tokens"),
                 F.sum(F.coalesce("mwl_x100", F.lit(0)))
                 .cast("bigint").alias("sum_mwl_x100"),
                 F.sum(F.coalesce("n_stop_hits", F.lit(0)))
                 .cast("bigint").alias("sum_stop_hits")))


def reputation_blocklist(stats: DataFrame, min_docs: int = 100,
                         max_keep_rate_bp: int = 2000) -> DataFrame:
    """Hosts whose quality-gate keep rate falls below max_keep_rate_bp
    basis points over at least min_docs documents — a DERIVED blocklist
    (feed it to filter_blocklisted_hosts). Integer cross-multiplication,
    no float thresholds; the spam-farm signal crawl pipelines compute from
    their own corpus when no curated list exists."""
    return (stats.filter(
        (F.col("n_docs") >= min_docs)
        & (F.col("n_keep") * 10_000 < F.lit(max_keep_rate_bp)
           * F.col("n_docs")))
        .select("host"))


def host_of(url: Column) -> Column:
    """Host part of an absolute http(s) url; '' for relative links.
    Scheme matching is case-insensitive (RFC 3986; 'HTTP://HOST' is valid
    and common on legacy pages) and the host is lowercased (DNS names are
    case-insensitive) so edges canonicalize. The host stops at '/', '?'
    OR '#': slash-less urls with a query ('http://h?x=1') are common and
    `[^/]+` would leak the query into the host key, splitting one real
    host into many graph nodes."""
    return F.lower(F.regexp_extract(url, r"(?i)^https?://([^/?#]+)", 1))


def canonical_url(url: Column) -> Column:
    """Crawl-style URL canonicalization, pure JVM expressions:

      * scheme and host lowercase (RFC 3986 case-insensitivity),
      * default port stripped (:80 for http, :443 for https),
      * fragment removed (never sent to the server),
      * a bare trailing '?' removed.

    Path/query case and param order are preserved (they are semantically
    significant). Non-URL strings (no scheme) pass through unchanged —
    total, like every kernel here. This is the url-side dedup key: the
    same page fetched as HTTP://Host:80/a#x and http://host/a must
    fingerprint identically."""
    # (?s): URLs can legally carry embedded newlines/CR from href/loc
    # text; without DOTALL the '.*'/'(.*)$' patterns fail to cover them,
    # silently DROPPING the whole path+query — two distinct URLs then
    # collapse onto one dedup key (scheme://host)
    u = F.regexp_replace(url, r"(?s)#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"(?i)^([a-z][a-z0-9+.-]*)://", 1))
    hostport = F.lower(
        F.regexp_extract(u, r"(?i)^[a-z][a-z0-9+.-]*://([^/?#]+)", 1))
    # strip a bare trailing '?' only when it is the query SEPARATOR with an
    # empty query (i.e. the only '?' in rest): '/p??' has query '?', and
    # stripping its last char would both mutate a real query and break
    # idempotency (canonical(canonical(u)) != canonical(u))
    rest = F.regexp_replace(
        F.regexp_extract(u, r"(?is)^[a-z][a-z0-9+.-]*://[^/?#]+(.*)$", 1),
        r"(?s)^([^?]*)\?$", "$1")
    # (:PORT)+$ not :PORT$: a malformed double port ('h:443:443') must
    # canonicalize in ONE application or the key is not idempotent
    # (pinned by test_canonical_url_idempotent)
    host = (F.when(scheme == "http", F.regexp_replace(hostport, r"(:80)+$", ""))
            .when(scheme == "https",
                  F.regexp_replace(hostport, r"(:443)+$", ""))
            .otherwise(hostport))
    return F.when(scheme != "",
                  F.concat(scheme, F.lit("://"), host, rest)).otherwise(url)


def link_host_edges(pages: DataFrame, url_col: str = "url",
                    html_col: str = "html") -> DataFrame:
    """Host-level link graph: (src_host, dst_host, n_links).

    Resolution rules: absolute http(s) -> its host; protocol-relative
    (//host/...) -> that host; path-relative -> the source host. Dropped:
    empty, fragments (#), and every non-http scheme (javascript:, mailto:,
    tel:, data:, ftp:, ...) — counting those as self-edges would inflate
    self-loop counts for PageRank/spam-signal consumers. One explode + one
    groupBy shuffle, zero Python."""
    src = host_of(F.col(url_col)).alias("src_host")
    # explode_OUTER: plain explode gets the document-scale href regexp
    # CLONED into an optimizer-inserted pre-explode filter
    # (InferFiltersFromGenerate — the CLAUDE.md gotcha, here with a JVM
    # expression), running it twice per page; the null rows outer adds
    # die in the same filter below that drops empties
    links = pages.select(
        src,
        F.explode_outer(
            extract_hrefs(decoded_html(F.col(html_col)))).alias("_l0"))
    # trim BEFORE classification (WHATWG URL parsing strips surrounding
    # whitespace): an href like '\n  http://other/x' would fail every
    # anchored pattern and fall through to a SELF edge, corrupting
    # exactly the counts the scheme filters exist to protect. Regexp
    # trim, NOT F.trim — Spark's trim strips only 0x20 spaces, not \n/\t
    links = links.select(
        "src_host",
        F.regexp_replace(F.col("_l0"), r"^\s+|\s+$", "").alias("_l"))
    l = F.col("_l")
    non_http_scheme = (l.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*:")
                       & ~l.rlike(r"(?i)^https?://"))
    pr_host = F.lower(F.regexp_extract(l, r"^//([^/?#]+)", 1))
    dst = (F.when(host_of(l) != "", host_of(l))
           .when(pr_host != "", pr_host)
           .otherwise(F.col("src_host")))
    return (
        links.filter(l.isNotNull() & (l != "") & ~l.startswith("#")
                     & ~non_http_scheme)
        .select("src_host", dst.alias("dst_host"))
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("n_links"))
    )
