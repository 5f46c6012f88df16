"""URL canonicalization — the crawl-pipeline identity operator.

A Common-Crawl-style corpus keys everything by url (the reference keys
results by pdf stem the same way, ``ui/utils.py:63-71``); re-crawls of
the same resource arrive with cosmetically different urls (case, default
ports, tracking params, fragments), so url-keyed dedup (S11
``latest_capture``) and the lineage anti-join undercount duplicates
without a pinned canonical form.

Everything is codegen'd column expressions; the only higher-order
function is the per-url query-param filter/sort (a handful of elements
per row — the interpreted-HOF cost model that rules out per-token HOFs
does not bite at this arity).

Pinned canonicalization semantics (each step deliberate, in order):

1. strip the fragment (``#...``),
2. lowercase scheme and host; strip default ports (``:80`` for http,
   ``:443`` for https),
3. drop tracking params (``utm_*``, ``fbclid``, ``gclid``), sort the
   surviving query params lexicographically, rejoin with ``&``; an
   emptied query drops its ``?``,
4. strip one trailing slash from a non-root path; a bare root path
   ``/`` unifies with the EMPTY path (``http://a.com/`` ==
   ``http://a.com`` per RFC 3986 §6.2.3 — the single most common
   cosmetic re-crawl variant),
5. a string with no ``scheme://`` prefix is returned unchanged (not a
   url — never guess).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_TRACKING_RE = r"^(utm_[^=]*|fbclid|gclid)(=|$)"


def canonical_url(url: Column) -> Column:
    """Pinned canonical form of a url column (see module docstring)."""
    u = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(u, _SCHEME_RE + r"([^/?]*)", 2))
    rest = F.regexp_extract(u, _SCHEME_RE + r"[^/?]*(.*)$", 2)

    host = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.regexp_replace(hostport, r":80$", ""),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.regexp_replace(hostport, r":443$", ""),
    ).otherwise(hostport)

    path = F.regexp_replace(
        F.regexp_extract(rest, r"^([^?]*)", 1), r"([^/])/$", r"$1"
    )
    path = F.when(path == "/", F.lit("")).otherwise(path)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.sort_array(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
        )
    )
    qstr = F.array_join(params, "&")

    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qstr != "", F.concat(F.lit("?"), qstr)).otherwise(F.lit("")),
    )
    return F.when(scheme == "", url).otherwise(canon)


def latest_capture_canonical(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """S11 (`latest_capture`) keyed by CANONICAL url: one row per
    canonical resource, the most recent capture wins; ties broken by
    the raw url (pinned, deterministic). One shuffle on the canonical
    key — the same profile as plain latest_capture."""
    from pyspark.sql import Window as W

    w = W.partitionBy("canonical_url").orderBy(
        F.desc("warc_ts"), F.asc(url_col)
    )
    return (
        pages.withColumn("canonical_url", canonical_url(F.col(url_col)))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def host_canonical(url: Column) -> Column:
    """DNS-equivalent registrable host of a url column: lowercase
    authority minus userinfo (greedy — browsers split on the LAST
    ``@``) and port, with percent-encoded dots decoded and trailing
    dots stripped.

    Layering note (deliberate, pinned): this is HOST identity for
    POLICY decisions (blocklists, per-host rate/skew handling), a
    strictly coarser equivalence than :func:`canonical_url`'s URL
    identity for dedup — canonical_url stays RFC 3986 §6 cosmetic-only
    (its oracle pins that), while DNS equivalences like the trailing
    dot belong here. Both sides of any host comparison must go through
    THIS function (the blocklist entries do)."""
    return _canon_domain_col(
        F.regexp_extract(url, _SCHEME_RE + r"([^/?#]*)", 2)
    )


def _canon_domain_col(col: Column) -> Column:
    """The canonicalization chain on an authority/domain COLUMN —
    shared by the url side (via :func:`host_canonical`) and the
    blocklist-entry side so both sides of the equality agree."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"^.*@", "")
    c = F.regexp_replace(c, r":\d+$", "")
    c = F.regexp_replace(c, r"%2e", ".")
    return F.regexp_replace(c, r"\.+$", "")


def _canon_domain(s: str) -> str:
    """Python twin of :func:`_canon_domain_col` for list-form blocklist
    ENTRIES (real UT1-style dumps carry trailing-dot entries)."""
    import re as _re

    s = str(s).lower()
    s = s.split("@")[-1]
    s = _re.sub(r":\d+$", "", s)
    s = s.replace("%2e", ".")
    return s.rstrip(".")


def registrable_domain(
    url: Column, rules=None, host_input: bool = False
) -> Column:
    """eTLD+1 / "registrable domain" of a url (or host, with
    ``host_input=True``) column — the SITE identity one level coarser
    than :func:`host_canonical`: ``blog.foo.com`` and ``shop.foo.com``
    both yield ``foo.com``, while two github.io customers stay
    distinct (``a.github.io`` -> ``a.github.io``; the PSL private
    section makes the sandbox domain itself the public suffix).

    Implements the full Public Suffix List algorithm
    (https://publicsuffix.org/list/): exception rules win outright,
    else the LONGEST matching exact/wildcard rule is the public
    suffix, else the default ``*`` rule (rightmost label); the
    registrable domain is the public suffix plus one label. NULL when
    the host is empty/unparseable, IS itself a public suffix, or is
    an IPv4 literal (IP hosts have no DNS site hierarchy — group
    them by full address via :func:`host_canonical` instead).

    ``rules`` defaults to the pinned snapshot
    (:mod:`table_ocr_spark.psl_snapshot`, provenance documented
    there); pass ``load_psl_file(path)`` output for a full pinned
    production list.

    Scale shape: map-only. The candidate-suffix fold runs at
    host-label arity (~4) against literal rule arrays — the same
    per-url-policy HOF budget as the rest of this module; nothing
    shuffles, nothing collects. The rule sets embed as plan literals
    (snapshot: ~190 entries; a full PSL is ~10k — still literal-safe,
    matching the blocklist InSet guidance)."""
    from table_ocr_spark.psl_snapshot import PSL_SNAPSHOT, parse_rules

    exact, wild, exc = parse_rules(PSL_SNAPSHOT if rules is None else rules)

    def _contains(values, col):
        # isin compiles to InSet (hash probe) above ~10 values — an
        # O(1) lookup per candidate suffix, so a full ~10k-rule
        # production PSL costs the same per host as the ~190-entry
        # snapshot (review r4: array_contains over a literal array was
        # an O(|rules|) string scan inside the per-host fold)
        if not values:
            return F.lit(False)
        return col.isin(*sorted(values))

    host = _canon_domain_col(url) if host_input else host_canonical(url)
    labels = F.split(host, r"\.")
    n = F.size(labels)

    def _cand(i):
        # candidate suffix starting at 1-indexed label i, its parent
        # (for wildcard rules), and its label count
        return F.struct(
            (n - i + 1).alias("slen"),
            F.array_join(F.slice(labels, i, n), ".").alias("sfx"),
            F.array_join(F.slice(labels, i + 1, n), ".").alias("par"),
        )

    agg = F.aggregate(
        F.transform(F.sequence(F.lit(1), n), _cand),
        F.struct(
            F.lit(0).alias("exc"),  # best exception ps length
            F.lit(1).alias("norm"),  # best exact/wildcard ps length
        ),
        lambda acc, c: F.struct(
            F.greatest(
                acc["exc"],
                F.when(_contains(exc, c["sfx"]), c["slen"] - 1).otherwise(0),
            ).alias("exc"),
            F.greatest(
                acc["norm"],
                F.when(_contains(exact, c["sfx"]), c["slen"]).otherwise(0),
                F.when(
                    (c["par"] != "") & _contains(wild, c["par"]), c["slen"]
                ).otherwise(0),
            ).alias("norm"),
        ),
    )
    ps_len = F.when(agg["exc"] > 0, agg["exc"]).otherwise(agg["norm"])
    # pinned IP-literal rule, IDENTICAL to registrable_domain_py: four
    # labels, each nonempty and all ASCII digits (Java \d is ASCII-only)
    # — any-length labels, so '1234.5.6.7' is IP-like on BOTH engines
    # (review r4: the twins previously disagreed on >3-digit labels)
    is_ipv4 = host.rlike(r"^\d+(\.\d+){3}$")
    return F.when(
        (host != "") & ~is_ipv4 & (n > ps_len),
        F.array_join(F.slice(labels, n - ps_len, ps_len + 1), "."),
    )


def filter_blocked_hosts(
    df: DataFrame,
    blocked,
    url_col: str = "url",
    include_subdomains: bool = True,
    keep_blocked: bool = False,
    block_registrable: bool = False,
) -> DataFrame:
    """Domain-blocklist filtering (the UT1/adult-blocklist stage every
    crawl pipeline runs before training): drop rows whose url host is
    on — or, with ``include_subdomains``, under — a blocked domain.

    ``blocked`` is a Python list of domains OR a one-column DataFrame
    ``(host)``. The list form embeds as an InSet literal and stays
    fully map-side — right up to ~10^4 entries (past that the literal
    bloats the serialized plan). For UT1-scale lists (~4M domains) use
    the DataFrame form: verdicts are computed once per DISTINCT host
    (Zipf-bounded) via an equi-join on the label-boundary suffixes —
    Spark broadcasts the blocklist while it fits and shuffle-joins
    past that; no driver materialization either way.

    ``keep_blocked=True`` returns the AUDIT view instead: every row
    with its ``host``, ``blocked`` flag and the matching
    ``blocked_domain`` (NULL when clean) — filters should be auditable
    before they are destructive. The audit column names are part of the
    contract, so an input already carrying them raises (no silent
    clobber); the filter path computes on internal columns and returns
    EXACTLY the input schema untouched.

    ``block_registrable=True`` widens every blocklist ENTRY to its
    eTLD+1 registrable domain (:func:`registrable_domain`, pinned PSL
    snapshot) before matching: a list carrying deep hosts like
    ``tracker.ads.bad.co.uk`` then blocks the whole ``bad.co.uk``
    site. Entries with no registrable domain (public suffixes, IPs)
    keep their canonical form — blocking ``github.io`` itself stays
    possible, deliberately. Off by default: a curated list's exact
    entries are a policy choice this operator must not silently
    widen.

    Subdomain semantics are suffix-at-label-boundary: ``a.bad.com``
    and ``bad.com`` match ``bad.com``; ``notbad.com`` does NOT. The
    matched host is the lowercase REGISTRABLE host: userinfo
    (``user@``) and port (``:8080``) are stripped before matching —
    the raw authority would let any blocked domain through via
    ``https://bad.com:443/`` or ``https://x@bad.com/`` (a filter a url
    author can route around is not a filter). Candidate suffixes are
    enumerated per row (a host has O(labels) suffixes, ~4) so both
    forms stay equi-operations — never a LIKE/contains theta join.
    """
    audit_cols = ("host", "blocked", "blocked_domain")
    clash = set(audit_cols) & set(df.columns)
    if keep_blocked and clash:
        raise ValueError(
            f"filter_blocked_hosts: input columns {sorted(clash)} collide "
            "with the audit output columns; rename them on the input first"
        )
    internal = {"_blh_host", "_blh_dom", "_sfx", "_bdom"} & set(df.columns)
    if internal:
        raise ValueError(
            f"filter_blocked_hosts: input columns {sorted(internal)} collide "
            "with internal working columns; rename them first"
        )
    # registrable host via host_canonical: userinfo stripped GREEDILY
    # (browsers/curl split on the LAST '@', so 'x@y@bad.com' resolves
    # to bad.com), port stripped, percent-encoded dots decoded,
    # trailing dots dropped — each a verified bypass class otherwise.
    # Blocklist ENTRIES go through the same canonicalization (UT1-style
    # dumps carry trailing-dot entries; one-sided canonicalization is
    # just a different bypass). Full Safe-Browsing canonicalization
    # (general %-decode, punycode) is out of scope and documented;
    # bracketed IPv6 literals keep their brackets and simply never
    # match a domain blocklist — correct, if conservative.
    with_host = df.withColumn("_blh_host", host_canonical(F.col(url_col)))
    # candidate suffixes at label boundaries: host itself + each
    # parent domain ("a.b.c" -> ["a.b.c", "b.c", "c"])
    labels = F.split(F.col("_blh_host"), r"\.")
    n = F.size(labels)
    suffixes = (
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.array_join(F.slice(labels, i + 1, n), "."),
        )
        if include_subdomains
        else F.array(F.col("_blh_host"))
    )

    if isinstance(blocked, DataFrame):
        # the verdict is a pure function of HOST, so it is computed
        # once per DISTINCT host (Zipf-bounded: ~10^7-8 hosts per
        # 10^12 docs) and equi-joined back — never a full-row exchange
        # entries that canonicalize to '' ('.', ':80', 'user@') would
        # match the '' host host_canonical yields for every schemeless/
        # unparseable url and silently drop all such rows (ADVICE r3)
        entry = _canon_domain_col(F.col(blocked.columns[0]))
        if block_registrable:
            entry = F.coalesce(
                registrable_domain(entry, host_input=True), entry
            )
        bl = (
            blocked.select(entry.alias("_bdom"))
            .where(F.col("_bdom").isNotNull() & (F.col("_bdom") != ""))
            .distinct()
        )
        hosts = with_host.select("_blh_host").distinct()
        ex = hosts.withColumn("_sfx", F.explode_outer(suffixes))
        verdicts = (
            ex.join(bl, ex["_sfx"] == bl["_bdom"], "left")
            .groupBy("_blh_host")
            .agg(F.min("_bdom").alias("_blh_dom"))
        )
        hits = with_host.join(verdicts, "_blh_host", "left")
    else:
        # '' entries excluded for the same reason as the DataFrame path
        canon_entries = (d for d in map(_canon_domain, blocked) if d)
        if block_registrable:
            from table_ocr_spark.psl_snapshot import registrable_domain_py

            canon_entries = (
                registrable_domain_py(d) or d for d in canon_entries
            )
        bl_set = sorted(set(canon_entries))
        matches = F.filter(
            suffixes, lambda s: s.isin(*bl_set) if bl_set else F.lit(False)
        )
        hits = with_host.withColumn("_blh_dom", F.array_min(matches))
    if keep_blocked:
        return hits.select(
            *df.columns,
            F.col("_blh_host").alias("host"),
            F.col("_blh_dom").alias("blocked_domain"),
            F.col("_blh_dom").isNotNull().alias("blocked"),
        )
    return hits.filter(F.col("_blh_dom").isNull()).select(*df.columns)
