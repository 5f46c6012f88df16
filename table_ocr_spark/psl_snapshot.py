"""Pinned public-suffix-list snapshot + rule parsing.

eTLD+1 ("registrable domain") grouping needs the Public Suffix List —
PUBLIC data maintained by the Mozilla Foundation at
https://publicsuffix.org/list/public_suffix_list.dat (MPL 2.0). This
module pins a SNAPSHOT SUBSET of that list (hand-verified entries,
taken from the list as published 2024; the upstream list changes
slowly and only in the tail) so that :func:`~table_ocr_spark.
operators.urlnorm.registrable_domain` works out of the box with zero
network access, deterministically, forever.

Why a subset is sound: the PSL algorithm's DEFAULT rule is ``*`` —
any TLD with no explicit entry behaves as a plain one-label public
suffix, which is the correct answer for the vast majority of hosts
(``a.b.example.com -> example.com``). Explicit entries only matter
where they CHANGE that default: multi-label public suffixes
(``co.uk``), wildcard rules (``*.ck``), exception rules (``!www.ck``),
and private-section sandbox domains (``github.io``). The snapshot
therefore carries exactly those rule classes; one-label ICANN TLD
entries (``com``, ``org``) are omitted because the default rule
already produces their behavior.

Production swap-in: download the full list once, snapshot-pin it in
your deployment artifact, and pass ``rules=load_psl_file(path)`` (or
any iterable of rule strings in PSL syntax) to the operators. The
matching logic is rule-driven; nothing is hardcoded to this subset.

Rule syntax handled (the full PSL spec, https://publicsuffix.org/list/):
``suffix`` (exact), ``*.suffix`` (wildcard: any label matches at the
``*`` position), ``!suffix`` (exception: cancels a wildcard — the
public suffix is the exception minus its leftmost label). Comment
lines (``//``) and blanks are skipped by the file loader. Rules are
matched against CANONICAL hosts (lowercase, no trailing dot), the
same normalization both operators apply to the url side.
"""

from __future__ import annotations

from typing import Iterable, Tuple

# Hand-verified subset of the Public Suffix List (publicsuffix.org,
# Mozilla Foundation, MPL 2.0). ICANN section: multi-label suffixes
# for the highest-traffic ccTLD registries + the canonical wildcard/
# exception examples. Private section: the major user-content
# sandbox domains (each customer subdomain is an independent "site" —
# exactly the boundary leakage-safe splits must respect).
PSL_SNAPSHOT: Tuple[str, ...] = (
    # ---- ICANN: uk ----
    "ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "net.uk",
    "nhs.uk", "org.uk", "plc.uk", "police.uk", "*.sch.uk",
    # ---- au ----
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    # ---- jp (incl. the city wildcard/exception block) ----
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    "*.kawasaki.jp", "*.kitakyushu.jp", "*.kobe.jp", "*.nagoya.jp",
    "*.sapporo.jp", "*.sendai.jp", "*.yokohama.jp",
    "!city.kawasaki.jp", "!city.kitakyushu.jp", "!city.kobe.jp",
    "!city.nagoya.jp", "!city.sapporo.jp", "!city.sendai.jp",
    "!city.yokohama.jp",
    # ---- nz ----
    "ac.nz", "co.nz", "geek.nz", "gen.nz", "govt.nz", "iwi.nz",
    "kiwi.nz", "maori.nz", "net.nz", "org.nz", "school.nz",
    # ---- za ----
    "ac.za", "co.za", "edu.za", "gov.za", "law.za", "mil.za",
    "net.za", "nom.za", "org.za", "school.za", "web.za",
    # ---- br ----
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "art.br",
    "blog.br", "eco.br",
    # ---- cn ----
    "ac.cn", "com.cn", "edu.cn", "gov.cn", "mil.cn", "net.cn", "org.cn",
    # ---- in ----
    "ac.in", "co.in", "edu.in", "firm.in", "gen.in", "gov.in",
    "ind.in", "net.in", "org.in",
    # ---- kr ----
    "ac.kr", "co.kr", "go.kr", "ne.kr", "or.kr", "pe.kr", "re.kr",
    # ---- tw ----
    "com.tw", "edu.tw", "gov.tw", "idv.tw", "net.tw", "org.tw",
    # ---- hk ----
    "com.hk", "edu.hk", "gov.hk", "idv.hk", "net.hk", "org.hk",
    # ---- sg ----
    "com.sg", "edu.sg", "gov.sg", "net.sg", "org.sg", "per.sg",
    # ---- mx / ar / tr / il ----
    "com.mx", "edu.mx", "gob.mx", "net.mx", "org.mx",
    "com.ar", "edu.ar", "gob.ar", "int.ar", "mil.ar", "net.ar", "org.ar",
    "com.tr", "edu.tr", "gov.tr", "net.tr", "org.tr", "av.tr", "bel.tr",
    "ac.il", "co.il", "gov.il", "idf.il", "muni.il", "net.il", "org.il",
    # ---- id / th / my / ph / vn ----
    "ac.id", "co.id", "go.id", "net.id", "or.id", "sch.id", "web.id",
    "ac.th", "co.th", "go.th", "in.th", "net.th", "or.th",
    "com.my", "edu.my", "gov.my", "net.my", "org.my",
    "com.ph", "edu.ph", "gov.ph", "net.ph", "org.ph",
    "com.vn", "edu.vn", "gov.vn", "net.vn", "org.vn",
    # ---- ua / pl ----
    "com.ua", "edu.ua", "gov.ua", "in.ua", "net.ua", "org.ua",
    "com.pl", "edu.pl", "gov.pl", "net.pl", "org.pl", "waw.pl",
    # ---- all-wildcard ccTLDs (the canonical PSL wildcard examples) ----
    "*.ck", "!www.ck",
    "*.bd", "*.er", "*.fk", "*.mm", "*.np", "*.pg",
    # ---- PRIVATE section: user-content sandboxes ----
    "github.io", "gitlab.io", "blogspot.com", "appspot.com",
    "herokuapp.com", "netlify.app", "vercel.app", "pages.dev",
    "workers.dev", "web.app", "firebaseapp.com", "azurewebsites.net",
    "cloudfront.net", "s3.amazonaws.com",
)


def parse_rules(rules: Iterable[str]):
    """Split PSL-syntax rules into the three matcher sets:
    ``(exact, wildcard_parents, exceptions)`` — all lowercase, no
    leading/trailing dots. Wildcard rules are stored as their PARENT
    (``*.ck`` -> ``ck``): a wildcard matches a candidate suffix iff
    the suffix minus its leftmost label equals a stored parent.
    Exceptions are stored as the full exception domain."""
    exact, wild, exc = set(), set(), set()
    for raw in rules:
        r = str(raw).strip().lower().strip(".")
        if not r or r.startswith("//"):
            continue
        if r.startswith("!"):
            exc.add(r[1:])
        elif r.startswith("*."):
            wild.add(r[2:])
        elif r == "*":
            continue  # the default rule is built into the algorithm
        else:
            exact.add(r)
    return exact, wild, exc


def load_psl_file(path: str):
    """Rule strings from a full ``public_suffix_list.dat`` download
    (comments/blank lines skipped, both ICANN and private sections
    kept — the private section is load-bearing for leakage safety:
    two github.io customers are different sites)."""
    out = []
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            s = line.strip()
            if not s or s.startswith("//"):
                continue
            out.append(s)
    return out


def registrable_domain_py(host: str, rules=None):
    """Pure-Python PSL algorithm (https://publicsuffix.org/list/):
    the driver-side twin used by tests and oracle generation. Returns
    the registrable domain (public suffix + 1 label) or None when the
    host IS a public suffix, is empty, or is an IPv4 literal.

    Matching: exceptions win outright; otherwise the LONGEST matching
    rule (exact or wildcard) is the public suffix; no match -> the
    default ``*`` rule (rightmost label)."""
    exact, wild, exc = parse_rules(PSL_SNAPSHOT if rules is None else rules)
    # trailing dots only — the Spark twin's host canonicalizer keeps a
    # LEADING dot (empty first label), so stripping it here made the
    # twins diverge on malformed hosts like '.co.uk' (review r4); such
    # hosts now yield the same odd-but-consistent result on both sides
    h = (host or "").lower().rstrip(".")
    if not h:
        return None
    labels = h.split(".")
    n = len(labels)
    # pinned IP-literal rule, IDENTICAL to the Spark twin's
    # rlike('^\\d+(\\.\\d+){3}$'): four labels, each nonempty and all
    # ASCII digits. isascii() matters — Python isdigit() accepts
    # unicode digits that Java's ASCII-only \d would reject.
    if n == 4 and all(p and p.isascii() and p.isdigit() for p in labels):
        return None  # IP literal — not in the DNS name hierarchy
    exc_len = 0
    norm_len = 1
    for i in range(n):
        sfx = ".".join(labels[i:])
        par = ".".join(labels[i + 1:])
        slen = n - i
        if sfx in exc:
            exc_len = max(exc_len, slen - 1)
        if sfx in exact or (par and par in wild):
            norm_len = max(norm_len, slen)
    ps_len = exc_len if exc_len > 0 else norm_len
    if n <= ps_len:
        return None
    return ".".join(labels[n - ps_len - 1:])
