"""robots.txt (RFC 9309) — crawl-frontier politeness for the crawl
stack: parse per-host robots bodies into rule tables, decide
allow/deny per url with longest-match semantics, and harvest Sitemap
pointers.

The reference fetches nothing (user-uploaded PDFs only,
``table_ocr/core.py``); its production-scale analogue — a pipeline fed
by a live crawl (BASELINE.json north rule) — must not even FRONTIER a
url its host's robots.txt disallows. This module closes that gap
Spark-first: robots bodies are just another crawled page
(``read_warc`` delivers them like any response), parsing is one
Arrow-batched kernel pass, and the allow/deny decision is a
join + argmax aggregation — no per-url Python anywhere in the
decision path.

Pinned RFC 9309 semantics (each deliberate):

- Group selection: the group(s) whose ``User-agent`` value equals the
  crawler's product token case-insensitively; if none, the ``*``
  group(s). Multiple matching groups MERGE (§2.2.1). No fuzzy/prefix
  agent matching — exact-or-star is the pinned subset.
- Rules: ``Allow``/``Disallow`` with ``*`` (any octets) and a trailing
  ``$`` (end anchor) in patterns (§2.2.3). An EMPTY Disallow value is
  not a rule ("disallow nothing").
- Decision: among rules whose pattern matches the url's path+query,
  the LONGEST pattern (octet length) wins; on a length tie Allow wins
  (§2.2.2). A url whose host has no rules — or no robots.txt at
  all — is allowed (§2.3.1.2–4 map "no usable file" to allow-all).
- Patterns and paths are compared as-is (no percent-(de)coding pass) —
  a pinned simplification; both sides of the comparison come from the
  same crawler so encodings agree by construction.
- ``max_rules`` caps rules kept per host IN FILE ORDER (§2.5 allows
  enforcing a parsing limit; Google's published limit is 500 KiB).
- ``Crawl-delay`` (not in RFC 9309 but honored by most crawlers, and
  the directive that closes the robots→frontier loop): group-scoped
  like rules; the value must parse as a FINITE non-negative number
  (anything else is ignored — a malformed delay must not stall a
  host); when merged selected groups declare several delays the
  MAXIMUM wins (the conservative politeness pin). The harvested
  per-host delay feeds ``frontier.plan_fetches(host_delays=...)``,
  where the caller's ``delay_s`` acts as a floor — a site can slow a
  polite crawler down, never speed it up past the crawler's own
  default.

Scale shape (100-TB argument):

- ``robots_rules`` is map-only (one Arrow kernel pass over per-host
  bodies; a robots body is KiBs — the per-host rule fan-out is capped
  by ``max_rules``, so the exploded rule table is ≤ hosts×max_rules).
- ``robots_decisions`` shuffles once on host (rules side is
  hosts×≤max_rules rows — broadcast-eligible for blocklist-sized rule
  sets, hash join at crawl scale) and aggregates once on url with a
  map-side-combinable ``max(struct)`` argmax — never a per-url window
  sort. Host skew on the pages side is the usual hot-host story; the
  rules side is bounded per key so the join fan-out cannot amplify
  it beyond max_rules.
- Matching stays inside JVM codegen, split by rule shape: patterns
  with no ``*``/``$`` (the overwhelming majority of real robots rules)
  are matched with ``startswith`` — a pure string op — and only
  wildcard/anchored patterns take ``regexp_like``. The split matters
  because Spark's RLike with a NON-LITERAL pattern re-compiles the
  regex per row; measured on the 1M-url × 10-rule rehearsal (block G),
  the prefix fast path cuts the decision pass ~2× (52.6 s → 27.7 s,
  the rerun under a LOWER host probe) with 9 of 10 rules
  prefix-shaped.
"""

from __future__ import annotations

import re
from typing import Iterator, List, Optional, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .urlnorm import host_canonical

_META = set(".^$+?{}[]()|\\")


def robots_pattern_regex(pattern: str) -> str:
    """Anchored regex for an RFC 9309 path pattern: literal except
    ``*`` (any octets) and one trailing ``$`` (end anchor). The escape
    set is the shared-safe regex subset (identical semantics in Java
    regex, RE2 and Python ``re``), the same portability pin as
    webfilter's rule regexes."""
    anchored_end = pattern.endswith("$")
    body = pattern[:-1] if anchored_end else pattern
    out = ["^"]
    for ch in body:
        if ch == "*":
            out.append(".*")
        elif ch in _META:
            out.append("\\" + ch)
        else:
            out.append(ch)
    if anchored_end:
        out.append("$")
    return "".join(out)


def parse_robots_body(
    body: str, agent: str, max_rules: int = 1000
) -> Tuple[List[Tuple[str, bool]], List[str], Optional[float]]:
    """Python reference parser (single source of the grammar — the
    Spark kernel calls THIS; tests fuzz it directly). Returns
    (rules, sitemaps, crawl_delay): rules are (pattern, allow) for
    the selected agent group(s), sitemaps are Sitemap directive
    values (which are group-independent per §2.2.4), crawl_delay is
    the selected group(s)' merged Crawl-delay in seconds (max over
    merged groups; None when absent/invalid — module-doc pins)."""
    import math

    agent_lc = agent.lower()
    groups: List[
        Tuple[List[str], List[Tuple[str, bool]], Optional[float]]
    ] = []
    sitemaps: List[str] = []
    cur_agents: List[str] = []
    cur_rules: Optional[List[Tuple[str, bool]]] = None
    cur_delay: Optional[float] = None
    for raw in body.split("\n"):
        line = raw.split("#", 1)[0].strip().rstrip("\r")
        if not line:
            continue
        key, sep, val = line.partition(":")
        if not sep:
            continue
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if cur_rules is not None:
                # a rule block ended: previous group closes
                groups.append((cur_agents, cur_rules, cur_delay))
                cur_agents, cur_rules, cur_delay = [], None, None
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            if not cur_agents:
                continue  # rules before any user-agent line: dropped
            if cur_rules is None:
                cur_rules = []
            if val == "" and key == "disallow":
                continue  # "Disallow:" == disallow nothing
            if val == "" and key == "allow":
                continue  # vacuous
            cur_rules.append((val, key == "allow"))
        elif key == "crawl-delay":
            if not cur_agents:
                continue  # group-scoped, like rules
            if cur_rules is None:
                cur_rules = []  # opens the rule block: next UA = new group
            try:
                d = float(val)
            except ValueError:
                continue  # malformed delay must not stall a host
            if math.isfinite(d) and d >= 0:
                cur_delay = d if cur_delay is None else max(cur_delay, d)
        elif key == "sitemap":
            if val:
                sitemaps.append(val)
    if cur_agents:
        groups.append((cur_agents, cur_rules or [], cur_delay))

    if any(agent_lc in agents for agents, _, _ in groups):
        sel = [g for g in groups if agent_lc in g[0]]
    else:
        sel = [g for g in groups if "*" in g[0]]
    selected = [r for _, rs, _ in sel for r in rs]
    delays = [d for _, _, d in sel if d is not None]
    return selected[:max_rules], sitemaps, max(delays, default=None)


_RULES_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("pattern", T.StringType()),
        T.StructField("allow", T.BooleanType()),
        T.StructField("pattern_len", T.IntegerType()),
        T.StructField("rx", T.StringType()),
    ]
)

_SITEMAP_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("sitemap_url", T.StringType()),
    ]
)

_DELAY_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("crawl_delay", T.DoubleType()),
    ]
)

_ALL_SCHEMA = T.StructType(
    list(_RULES_SCHEMA.fields)
    + [T.StructField("crawl_delay", T.DoubleType())]
)

_EMIT_SCHEMAS = {
    "rules": _RULES_SCHEMA,
    "sitemaps": _SITEMAP_SCHEMA,
    "delays": _DELAY_SCHEMA,
    "all": _ALL_SCHEMA,
}


def _parse_kernel(agent: str, max_rules: int, emit: str):
    import pandas as pd

    def kernel(batches) -> Iterator:
        for pdf in batches:
            rows: list = []
            for host, body in zip(pdf["_host"], pdf["_body"]):
                if body is None:
                    continue
                rules, maps, delay = parse_robots_body(
                    body, agent, max_rules
                )
                if emit == "rules":
                    for pat, allow in rules:
                        rows.append(
                            (
                                host,
                                pat,
                                allow,
                                len(pat.encode("utf-8")),
                                robots_pattern_regex(pat),
                            )
                        )
                elif emit == "delays":
                    if delay is not None:
                        rows.append((host, delay))
                elif emit == "all":
                    # one row per rule (crawl_delay NULL) plus — when
                    # the host declares one — a single pattern-NULL
                    # delay row, so hosts with a delay but no rules
                    # keep it
                    for pat, allow in rules:
                        rows.append(
                            (
                                host,
                                pat,
                                allow,
                                len(pat.encode("utf-8")),
                                robots_pattern_regex(pat),
                                None,
                            )
                        )
                    if delay is not None:
                        rows.append((host, None, None, None, None, delay))
                else:
                    for sm in maps:
                        rows.append((host, sm))
            schema = _EMIT_SCHEMAS[emit]
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    return kernel


def robots_rules(
    robots: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    body_col: str = "robots_txt",
    max_rules: int = 1000,
) -> DataFrame:
    """Per-host robots bodies → exploded rule table
    (host, pattern, allow, pattern_len, rx). Map-only."""
    return robots.select(
        F.col(host_col).alias("_host"), F.col(body_col).alias("_body")
    ).mapInPandas(_parse_kernel(agent, max_rules, "rules"), _RULES_SCHEMA)


def robots_tables(
    robots: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    body_col: str = "robots_txt",
    max_rules: int = 1000,
    persist: bool = True,
    return_combined: bool = False,
):
    """(rules, delays) from ONE parse pass over the bodies — the
    crawl-loop shape, where both tables are consumed every turn and
    running :func:`robots_rules` + :func:`robots_crawl_delays`
    separately would parse every body twice. The combined frame is
    hosts×(rules+1) rows, persisted by default so the two derived
    tables share the single parse at action time.

    CACHE LIFECYCLE: a ``persist=True`` call hands the cache's
    lifetime to the CALLER — pass ``return_combined=True`` to get
    ``(rules, delays, combined)`` and ``combined.unpersist()`` once
    your actions have run. Without the handle nothing can release the
    cache, so a loop calling this every turn (a streaming crawl)
    accumulates one cached frame per call for the session's lifetime;
    such callers must either take the handle or pass
    ``persist=False`` (one extra parse per action, bounded by the
    robots frame — one row per host)."""
    combined = robots.select(
        F.col(host_col).alias("_host"), F.col(body_col).alias("_body")
    ).mapInPandas(_parse_kernel(agent, max_rules, "all"), _ALL_SCHEMA)
    if persist:
        combined = combined.persist()
    rules = combined.filter(F.col("pattern").isNotNull()).drop(
        "crawl_delay"
    )
    delays = combined.filter(F.col("crawl_delay").isNotNull()).select(
        "host", "crawl_delay"
    )
    if return_combined:
        return rules, delays, combined
    return rules, delays


def robots_crawl_delays(
    robots: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    body_col: str = "robots_txt",
) -> DataFrame:
    """Per-host Crawl-delay for the selected agent group(s) —
    (host, crawl_delay double), hosts without a valid declared delay
    omitted. Map-only; feed the result to
    ``frontier.plan_fetches(host_delays=...)`` so the fetch plan's
    eta honors each site's own rate request (module-doc pins)."""
    return robots.select(
        F.col(host_col).alias("_host"), F.col(body_col).alias("_body")
    ).mapInPandas(_parse_kernel(agent, 0, "delays"), _DELAY_SCHEMA)


def robots_sitemaps(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "robots_txt",
) -> DataFrame:
    """Sitemap directives per host (group-independent, §2.2.4) —
    the crawl-frontier seed source."""
    return robots.select(
        F.col(host_col).alias("_host"), F.col(body_col).alias("_body")
    ).mapInPandas(_parse_kernel("*", 0, "sitemaps"), _SITEMAP_SCHEMA)


def url_path_query(url: Column) -> Column:
    """The path+query a robots pattern is matched against: everything
    after the authority, fragment stripped, empty path pinned to
    ``/`` (§2.2.2 matches against the path beginning with ``/``)."""
    rest = F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    rest = F.regexp_replace(rest, r"#.*$", "")
    return F.when(rest == "", F.lit("/")).otherwise(rest)


def robots_decisions(
    pages: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    broadcast_rules: bool = False,
) -> DataFrame:
    """Distinct urls of ``pages`` → (url, allowed, matched_pattern).

    One join on host + one ``max(struct)`` argmax on url; a url whose
    host carries no matching rule (or no rules at all) is allowed.
    ``broadcast_rules=True`` pins a broadcast join for
    blocklist-sized rule tables."""
    urls = (
        pages.select(F.col(url_col).alias("url"))
        .distinct()
        .withColumn("_host", host_canonical(F.col("url")))
        .withColumn("_path", url_path_query(F.col("url")))
    )
    # BOTH sides of the host equality go through the canonicalizer
    # (urlnorm.host_canonical's pinned rule): a rules frame keyed
    # 'Example.COM' / 'example.com.' / 'example.com:443' must still
    # join the urls' canonical host — taking rules.host verbatim
    # would silently disable every rule on that host (a politeness
    # violation with no error)
    from .urlnorm import _canon_domain_col

    r = rules.select(
        _canon_domain_col(F.col("host")).alias("_host"),
        "pattern",
        "allow",
        "pattern_len",
        "rx",
    )
    if broadcast_rules:
        r = F.broadcast(r)
    joined = urls.join(r, "_host", "left")
    # prefix rules (no '*'/'$') match via startswith — Spark's RLike
    # with a column-typed pattern recompiles the regex PER ROW, so
    # keeping the common case regex-free is a measured ~2× on the
    # 1M-url rehearsal (module doc)
    is_prefix = ~F.col("pattern").contains("*") & ~F.col(
        "pattern"
    ).contains("$")
    matched = F.col("rx").isNotNull() & F.when(
        is_prefix, F.col("_path").startswith(F.col("pattern"))
    ).otherwise(F.regexp_like(F.col("_path"), F.col("rx")))
    best = F.max(
        F.when(
            matched,
            F.struct(
                F.col("pattern_len"),
                F.col("allow").cast("int").alias("allow_i"),
                F.col("pattern"),
            ),
        )
    ).alias("best")
    return joined.groupBy("url").agg(best).select(
        "url",
        F.coalesce(F.col("best.allow_i") == 1, F.lit(True)).alias("allowed"),
        F.col("best.pattern").alias("matched_pattern"),
    )


def filter_robots_allowed(
    pages: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    broadcast_rules: bool = False,
) -> DataFrame:
    """Keep only pages whose url the rule table allows — the frontier
    filter. Decision frame is url-keyed, so the final step is a semi
    join back on the url column."""
    dec = robots_decisions(pages, rules, url_col, broadcast_rules)
    allowed = dec.filter(F.col("allowed")).select(
        F.col("url").alias("__allowed_url")
    )
    return pages.join(
        allowed, pages[url_col] == F.col("__allowed_url"), "left_semi"
    )
