"""Public-suffix registrable-domain extraction (functions/psl.py).

The strict gate (text_stats_suite row 'psl') proves Spark == DuckDB on
the fixture parities; these tests prove the ALGORITHM is right: the
distributed matcher agrees with a textbook pure-Python PSL
implementation on crafted hosts covering every rule interaction —
wildcard vs exception precedence, longest-match, host == suffix, deep
subdomains, unlisted TLDs.
"""

from paddleocr_spark.functions.psl import (
    PSL_RULES,
    registrable_domains,
)


def _py_psl(host: str) -> tuple[str, str]:
    """Textbook publicsuffix.org algorithm over PSL_RULES:
    (public_suffix, registrable)."""
    labels = host.split(".")

    def rule_matches(rule: str) -> bool:
        r = rule.split(".")
        if len(r) > len(labels):
            return False
        for rl, hl in zip(reversed(r), reversed(labels)):
            if rl != "*" and rl != hl:
                return False
        return True

    exc = [
        r.lstrip("!") for r, _, e in PSL_RULES
        if e and rule_matches(r.lstrip("!"))
    ]
    if exc:
        psl_n = max(len(r.split(".")) for r in exc) - 1
    else:
        norm = [
            n for r, n, e in PSL_RULES
            if not e and rule_matches(r)
        ]
        psl_n = max(norm) if norm else 1
    suffix = ".".join(labels[-psl_n:])
    reg = ".".join(labels[-(psl_n + 1):]) if len(labels) > psl_n else ""
    return suffix, reg


CASES = [
    "www.site1.com",              # plain TLD
    "deep.a.b.site.co.uk",        # multi-label suffix, deep subdomain
    "alice.github.io",            # platform suffix
    "github.io",                  # host IS a public suffix -> ''
    "x.shop.ck",                  # wildcard *.ck
    "shop.ck",                    # wildcard: host IS the suffix -> ''
    "www.ck",                     # exception beats wildcard
    "sub.www.ck",                 # exception suffix + one label
    "host.unlisted",              # default rule
    "unlisted",                   # bare unlisted TLD -> ''
    "a.ne.jp",                    # 2-label suffix, exactly psl+1
]


def test_matches_textbook_python_psl(spark):
    hosts = spark.createDataFrame(
        [(i, h) for i, h in enumerate(CASES)], "doc_id long, host string"
    )
    got = {
        r["host"]: (r["public_suffix"], r["registrable"])
        for r in registrable_domains(spark, hosts).collect()
    }
    assert len(got) == len(CASES)
    for h in CASES:
        assert got[h] == _py_psl(h), h


def test_key_semantics():
    """The outcomes that make eTLD+1 the right grouping key, pinned as
    literals so a rule-table edit can't silently drift them."""
    assert _py_psl("a.blog.ex.co.uk")[1] == "ex.co.uk"
    assert _py_psl("b.shop.ex.co.uk")[1] == "ex.co.uk"     # same site
    assert _py_psl("alice.github.io")[1] == "alice.github.io"
    assert _py_psl("bob.github.io")[1] == "bob.github.io"  # different
    assert _py_psl("www.ck") == ("ck", "www.ck")           # exception
    assert _py_psl("x.foo.ck") == ("foo.ck", "x.foo.ck")   # wildcard


def test_rule_table_is_broadcast(spark):
    hosts = spark.createDataFrame(
        [(0, "www.site.com")], "doc_id long, host string"
    )
    plan = (
        registrable_domains(spark, hosts)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
