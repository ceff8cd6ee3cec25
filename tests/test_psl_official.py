"""registered_domain_psl vs the OFFICIAL publicsuffix.org test
vectors (Mozilla's ``checkPublicSuffix`` test data, published at
publicsuffix.org/list — placed in the public domain by its author
Rob Stradling / Comodo; reproduced verbatim below minus the
documented exclusions).

The vectors run against the real PSL; the fixture here is the exact
RULE SUBSET those vectors touch, written in the publicsuffix.org
file format (comments, ``*.`` wildcards, ``!`` exceptions) and fed
through :func:`parse_psl` so the parser is exercised too.

Convention mapping (documented on the operator): the official
``checkPublicSuffix(host, NULL)`` cases — host IS a public suffix or
has no registrable part — map to the operator's PASS-THROUGH of the
lowercased host (the engine tags every row; a curation pipeline
drops or caps on the tag downstream, it never needs a NULL).

Documented exclusions (2 of the official blocks):

- ``checkPublicSuffix(NULL, NULL)`` and the leading-dot block
  (``.com``, ``.example.com``, ...): malformed hostnames. The
  operator consumes CANONICALIZED hosts (url_canonicalize upstream
  strips empty labels); feeding a leading-dot host is a caller bug,
  not a PSL-algorithm case.
- CROSS-form IDN (punycode host against a Unicode rule or vice
  versa): the engine does byte-literal label matching and no
  IDN/punycode conversion — callers must canonicalize hosts and
  supply the PSL in the SAME form. Both same-form blocks (Unicode
  hosts + Unicode rules; punycode hosts + punycode rules) ARE
  covered below.
"""

from __future__ import annotations

from tests.conftest import assert_matches_oracle
from umls2rdf_spark.operators.webcurate import (
    parse_psl,
    registered_domain_psl,
    registered_domain_psl_sql,
)

# the rule subset of the real PSL that the official vectors touch,
# in publicsuffix.org file format
_MINI_PSL = """\
// ===BEGIN ICANN DOMAINS===
com
biz
ac
// uk.com is in the PRIVATE section of the real list; parse_psl
// intentionally ignores the section split
uk.com
*.mm
jp
ac.jp
kyoto.jp
ide.kyoto.jp
*.kobe.jp
!city.kobe.jp
*.ck
!www.ck
us
ak.us
k12.ak.us
cn
com.cn
公司.cn
中国
xn--55qx5d.cn
xn--fiqs8s
// ===END ICANN DOMAINS===
"""

#: (host, expected registrable domain or None) — verbatim from the
#: official checkPublicSuffix data, minus the two excluded blocks
OFFICIAL_VECTORS: list[tuple[str, str | None]] = [
    # Mixed case.
    ("COM", None),
    ("example.COM", "example.com"),
    ("WwW.example.COM", "example.com"),
    # Unlisted TLD.
    ("example", None),
    ("example.example", "example.example"),
    ("b.example.example", "example.example"),
    ("a.b.example.example", "example.example"),
    # TLD with only 1 rule.
    ("biz", None),
    ("domain.biz", "domain.biz"),
    ("b.domain.biz", "domain.biz"),
    ("a.b.domain.biz", "domain.biz"),
    # TLD with some 2-level rules.
    ("com", None),
    ("example.com", "example.com"),
    ("b.example.com", "example.com"),
    ("a.b.example.com", "example.com"),
    ("uk.com", None),
    ("example.uk.com", "example.uk.com"),
    ("b.example.uk.com", "example.uk.com"),
    ("a.b.example.uk.com", "example.uk.com"),
    ("test.ac", "test.ac"),
    # TLD with only 1 (wildcard) rule.
    ("mm", None),
    ("c.mm", None),
    ("b.c.mm", "b.c.mm"),
    ("a.b.c.mm", "b.c.mm"),
    # More complex TLD.
    ("jp", None),
    ("test.jp", "test.jp"),
    ("www.test.jp", "test.jp"),
    ("ac.jp", None),
    ("test.ac.jp", "test.ac.jp"),
    ("www.test.ac.jp", "test.ac.jp"),
    ("kyoto.jp", None),
    ("test.kyoto.jp", "test.kyoto.jp"),
    ("ide.kyoto.jp", None),
    ("b.ide.kyoto.jp", "b.ide.kyoto.jp"),
    ("a.b.ide.kyoto.jp", "b.ide.kyoto.jp"),
    ("c.kobe.jp", None),
    ("b.c.kobe.jp", "b.c.kobe.jp"),
    ("a.b.c.kobe.jp", "b.c.kobe.jp"),
    ("city.kobe.jp", "city.kobe.jp"),
    ("www.city.kobe.jp", "city.kobe.jp"),
    # TLD with a wildcard rule and exceptions.
    ("ck", None),
    ("test.ck", None),
    ("b.test.ck", "b.test.ck"),
    ("a.b.test.ck", "b.test.ck"),
    ("www.ck", "www.ck"),
    ("www.www.ck", "www.ck"),
    # US K12.
    ("us", None),
    ("test.us", "test.us"),
    ("www.test.us", "test.us"),
    ("ak.us", None),
    ("test.ak.us", "test.ak.us"),
    ("www.test.ak.us", "test.ak.us"),
    ("k12.ak.us", None),
    ("test.k12.ak.us", "test.k12.ak.us"),
    ("www.test.k12.ak.us", "test.k12.ak.us"),
    # IDN labels (Unicode hosts against Unicode rules).
    ("食狮.com.cn", "食狮.com.cn"),
    ("食狮.公司.cn", "食狮.公司.cn"),
    ("www.食狮.公司.cn", "食狮.公司.cn"),
    ("shishi.公司.cn", "shishi.公司.cn"),
    ("公司.cn", None),
    ("食狮.中国", "食狮.中国"),
    ("www.食狮.中国", "食狮.中国"),
    ("shishi.中国", "shishi.中国"),
    ("中国", None),
    # Same as above, but punycoded (punycode hosts against the
    # punycode rules — same-form matching).
    ("xn--85x722f.com.cn", "xn--85x722f.com.cn"),
    ("xn--85x722f.xn--55qx5d.cn", "xn--85x722f.xn--55qx5d.cn"),
    ("www.xn--85x722f.xn--55qx5d.cn", "xn--85x722f.xn--55qx5d.cn"),
    ("shishi.xn--55qx5d.cn", "shishi.xn--55qx5d.cn"),
    ("xn--55qx5d.cn", None),
    ("xn--85x722f.xn--fiqs8s", "xn--85x722f.xn--fiqs8s"),
    ("www.xn--85x722f.xn--fiqs8s", "xn--85x722f.xn--fiqs8s"),
    ("shishi.xn--fiqs8s", "shishi.xn--fiqs8s"),
    ("xn--fiqs8s", None),
]


def test_parse_psl_on_file_format():
    rules = parse_psl(_MINI_PSL)
    assert "com" in rules and "*.kobe.jp" in rules
    assert "!city.kobe.jp" in rules and "公司.cn" in rules
    assert not any(r.startswith("//") for r in rules)
    assert len(rules) == 22


def test_official_checkpublicsuffix_vectors_spark(spark):
    rules = parse_psl(_MINI_PSL)
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(OFFICIAL_VECTORS)],
        "id long, host string",
    )
    got = {
        r["id"]: r["reg_domain"]
        for r in registered_domain_psl(df, "host", rules).collect()
    }
    for i, (host, want) in enumerate(OFFICIAL_VECTORS):
        expect = want if want is not None else host.lower()
        assert got[i] == expect, (host, want, got[i])


def test_official_checkpublicsuffix_vectors_oracle_parity(spark, duck):
    """The DuckDB twin lands on the identical answers for every
    official vector (both engines, same generated key table)."""
    rules = parse_psl(_MINI_PSL)
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(OFFICIAL_VECTORS)],
        "id long, host string",
    )
    got = registered_domain_psl(df, "host", rules)
    inline = "SELECT * FROM (VALUES " + ", ".join(
        f"({i}, '{h}')" for i, (h, _) in enumerate(OFFICIAL_VECTORS)
    ) + ") AS v(id, host)"
    assert_matches_oracle(
        got, duck, registered_domain_psl_sql(inline, "host", rules)
    )
