"""URL / web-ingest operators (`operators/web.py`, r11) and encoding
repair (`operators/text.py fix_encoding`): golden normalization cases,
eTLD+1 rules, URL dedup, the ranked-window domain cap, and the mojibake
replace chain."""

from __future__ import annotations

import pyspark.sql.functions as F

from automated_datastore_discovery_with_aws_glue_spark.operators import web as W
from automated_datastore_discovery_with_aws_glue_spark.operators.text import (
    fix_encoding,
    fix_mojibake,
)


def _norm(spark, url):
    df = spark.createDataFrame([(url,)], ["u"])
    return df.select(W.url_normalize(F.col("u")).alias("n")).collect()[0]["n"]


def _dom(spark, host):
    df = spark.createDataFrame([(host,)], ["h"])
    return df.select(W.registered_domain(F.col("h")).alias("d")).collect()[0]["d"]


def _fix(spark, text):
    df = spark.createDataFrame([(text,)], ["t"])
    return df.select(fix_encoding(F.col("t")).alias("f")).collect()[0]["f"]


# -- url_normalize ------------------------------------------------------


def test_normalize_case_www_default_port(spark):
    assert (
        _norm(spark, "HTTP://WWW.Example.COM:80/Path/To")
        == "http://example.com/Path/To"
    )


def test_normalize_https_443_stripped_http_443_kept(spark):
    assert _norm(spark, "https://a.com:443/x") == "https://a.com/x"
    # :443 on http is NOT the default port — kept
    assert _norm(spark, "http://a.com:443/x") == "http://a.com:443/x"
    assert _norm(spark, "http://a.com:8080/x") == "http://a.com:8080/x"


def test_normalize_path_rules(spark):
    assert _norm(spark, "http://a.com") == "http://a.com/"
    assert _norm(spark, "http://a.com/") == "http://a.com/"
    assert _norm(spark, "http://a.com/p/") == "http://a.com/p"
    assert _norm(spark, "http://a.com/p///") == "http://a.com/p"


def test_normalize_drops_tracking_params_keeps_order(spark):
    u = "http://a.com/p?utm_source=x&b=2&gclid=g&a=1&fbclid=f&ref=t"
    assert _norm(spark, u) == "http://a.com/p?b=2&a=1"


def test_normalize_all_params_dropped_removes_question_mark(spark):
    assert _norm(spark, "http://a.com/p?utm_source=x&utm_medium=y") == "http://a.com/p"
    assert _norm(spark, "http://a.com/p?") == "http://a.com/p"


def test_normalize_drops_fragment(spark):
    assert _norm(spark, "http://a.com/p?id=1#section-2") == "http://a.com/p?id=1"


def test_normalize_unparseable_is_null(spark):
    assert _norm(spark, "not a url") is None
    assert _norm(spark, "example.com/p") is None  # no scheme


def test_normalize_strips_userinfo(spark):
    # userinfo stripped (blocklist-bypass hardening); a reserved escape
    # like %20 is NOT decoded (only its hex case normalizes)
    assert _norm(spark, "http://u:p@a.com/x%20y") == "http://a.com/x%20y"
    # the attacker-chosen 'trusted@blocked' authority keys on the REAL host
    assert _dom(spark, "a.com") == "a.com"
    assert (
        _norm(spark, "http://trusted.com@blocked.com/x") == "http://blocked.com/x"
    )


# -- percent-encoding normalization (r12) --------------------------------


def test_pct_unreserved_escapes_decode(spark):
    # %41='A' (then host-lowercased), %7e='~', %70='p', %31='1'
    assert _norm(spark, "http://a.com/%70/%317") == "http://a.com/p/17"
    assert _norm(spark, "http://a.com/%7e%41x") == "http://a.com/~Ax"


def test_pct_reserved_escapes_keep_but_uppercase(spark):
    # %2f is an ENCODED slash — data, not structure; only hex case folds
    assert _norm(spark, "http://a.com/p?y=%2fv") == "http://a.com/p?y=%2Fv"
    # %25 (the escape of '%') must survive undecoded and idempotently
    assert _norm(spark, "http://a.com/p%25100") == "http://a.com/p%25100"


def test_pct_decode_runs_before_tracking_filter(spark):
    # an escape-disguised tracker name must still drop
    assert _norm(spark, "http://a.com/p?%66bclid=f&id=1") == "http://a.com/p?id=1"


def test_pct_invalid_sequence_quarantines_to_null(spark):
    assert _norm(spark, "http://a.com/p?bad=%zz") is None
    assert _norm(spark, "http://a.com/100%") is None
    assert _norm(spark, "http://a.com/%4") is None


def test_pct_disguised_urls_dedup_with_clean_twins(spark):
    rows = [(1, "http://a.com/p/9"), (2, "http://www.a.com/%70/9")]
    df = spark.createDataFrame(rows, ["id", "url"])
    out = W.url_dedup(df, "id", "url").collect()
    assert len(out) == 1 and out[0]["dup_count"] == 2


def test_normalize_drops_valueless_tracking_params(spark):
    assert _norm(spark, "http://a.com/p?fbclid&id=1&utm_source") == "http://a.com/p?id=1"
    # a non-tracking valueless param is kept
    assert _norm(spark, "http://a.com/p?flag") == "http://a.com/p?flag"
    # 'ref' must match whole-name only: 'referrer=x' is NOT a tracker
    assert _norm(spark, "http://a.com/p?referrer=x") == "http://a.com/p?referrer=x"


def test_normalize_tracking_params_case_insensitive(spark):
    # scheme/host are case-folded, so case-variant trackers must drop too
    assert (
        _norm(spark, "http://a.com/p?UTM_SOURCE=x&FBCLID=y&id=1")
        == "http://a.com/p?id=1"
    )
    assert _norm(spark, "http://a.com/p?Ref=tw&GCLID") == "http://a.com/p"


# -- registered_domain --------------------------------------------------


def test_registered_domain_rules(spark):
    assert _dom(spark, "localhost") == "localhost"
    assert _dom(spark, "example.com") == "example.com"
    assert _dom(spark, "a.b.example.com") == "example.com"
    assert _dom(spark, "blog.example.co.uk") == "example.co.uk"
    assert _dom(spark, "a.b.example.co.uk") == "example.co.uk"
    # a bare two-part suffix has no registrable label — returned whole
    assert _dom(spark, "co.uk") == "co.uk"


def test_registered_domain_join_psl_rules(spark):
    # the table-backed longest-match form: ccTLD second-level suffixes,
    # a 3-label suffix, private hosting suffixes, deep subdomains,
    # bare labels, explicit ports, bare suffixes, NULL totality
    cases = {
        "a.example.com.ar": "example.com.ar",
        "shop.co.za": "shop.co.za",
        "x.y.proj.github.io": "proj.github.io",
        "deep.blog.example.co.uk": "example.co.uk",
        "b.blogspot.co.uk": "b.blogspot.co.uk",  # 3-label private suffix
        "localhost": "localhost",
        "example.com": "example.com",
        "sub.example.org:8443": "example.org",
        "school.k12.ca.us": "school.k12.ca.us",
        "k12.ca.us": "k12.ca.us",  # bare suffix: no registrable part
        "co.za": "co.za",
        # wildcard rule *.ck: any single label under ck is a suffix
        "ck": "ck",  # the * must consume a real label
        "x.ck": "x.ck",  # bare wildcard suffix: no registrable part
        "a.x.ck": "a.x.ck",
        "deep.a.x.ck": "a.x.ck",
        # exception rule !www.ck: carved back out of the wildcard
        "www.ck": "www.ck",
        "media.www.ck": "www.ck",
        # 3-label wildcard *.sch.uk (beats the exact 2-label sch.uk)
        "x.sch.uk": "x.sch.uk",
        "pupils.x.sch.uk": "pupils.x.sch.uk",
        None: None,
    }
    df = spark.createDataFrame([(h,) for h in cases], "h string")
    out = {r["h"]: r["domain"] for r in W.registered_domain_join(df, "h").collect()}
    assert out == cases


def test_registered_domain_join_custom_table_and_plan(spark):
    # a user-supplied registry slice; deeper match must win
    df = spark.createDataFrame([("a.b.x.example",), ("y.example",)], "h string")
    out = W.registered_domain_join(df, "h", suffixes=("example", "x.example"))
    got = {r["h"]: r["domain"] for r in out.collect()}
    assert got == {"a.b.x.example": "b.x.example", "y.example": "y.example"}
    # zero shuffles: broadcast joins only
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan


def test_registered_domain_strips_explicit_ports(spark):
    # url_host only removes the scheme's DEFAULT port — a blocklist
    # keyed on registered_domain must not be bypassable with ':8080',
    # and a port must not defeat the two-part-suffix check
    assert _dom(spark, "blocked.com:8080") == "blocked.com"
    assert _dom(spark, "blog.example.co.uk:8443") == "example.co.uk"
    assert _dom(spark, "localhost:3000") == "localhost"


# -- url_dedup ----------------------------------------------------------


def test_url_dedup_keeps_lowest_id_and_counts(spark):
    rows = [
        (1, "http://www.A.com/p/"),
        (2, "http://a.com/p?utm_source=z"),
        (3, "https://a.com/p"),
        (4, "garbage"),
    ]
    df = spark.createDataFrame(rows, ["id", "url"])
    out = {r["id"]: r for r in W.url_dedup(df, "id", "url").collect()}
    assert set(out) == {1, 3}  # 2 is a dup of 1; 4 unparseable -> dropped
    assert out[1]["url_norm"] == "http://a.com/p"
    assert out[1]["dup_count"] == 2
    assert out[3]["dup_count"] == 1


# -- domain_cap ---------------------------------------------------------


def test_domain_cap_keeps_best_cap_rows_per_domain(spark):
    rows = [(i, "big.com" if i < 30 else f"small{i % 3}.com", i * 7 % 13) for i in range(45)]
    df = spark.createDataFrame(rows, ["id", "domain", "quality"])
    capped = W.domain_cap(df, "domain", 5).collect()
    by_dom: dict[str, list] = {}
    for r in capped:
        by_dom.setdefault(r["domain"], []).append(r)
    assert len(by_dom["big.com"]) == 5
    # best-first: the kept big.com rows are the top-5 by (quality desc, id)
    expect = sorted(
        [r for r in rows if r[1] == "big.com"], key=lambda r: (-r[2], r[0])
    )[:5]
    assert sorted(r["id"] for r in by_dom["big.com"]) == sorted(r[0] for r in expect)
    # under-cap domains pass through whole
    for d in ("small0.com", "small1.com", "small2.com"):
        assert len(by_dom[d]) == len([r for r in rows if r[1] == d])


def test_domain_cap_null_domains_form_one_capped_group(spark):
    # the operator is total: NULL-domain rows are neither dropped nor
    # exempt — they cap as one group (null-safe count join)
    rows = [(i, None if i < 9 else "a.com", i) for i in range(12)]
    df = spark.createDataFrame(rows, "id int, domain string, quality int")
    out = W.domain_cap(df, "domain", 5).collect()
    nulls = [r for r in out if r["domain"] is None]
    assert len(nulls) == 5
    # best-first within the NULL group: top-5 by quality desc
    assert sorted(r["id"] for r in nulls) == [4, 5, 6, 7, 8]
    assert len([r for r in out if r["domain"] == "a.com"]) == 3


# -- fix_encoding -------------------------------------------------------


def test_fix_mojibake_pairs_and_order(spark):
    assert _fix(spark, "CafÃ© â€” itâ€™s â€œfineâ€\x9d") == "Café - it's \"fine\""
    # three-char sequences decode before the shared 'Ã ' pair can split them
    assert _fix(spark, "waitâ€¦ Ã  la") == "wait... à la"
    # the TRUE cp1252 artifact for 'à' is Ã + NBSP (0xC3 0xA0 double-decoded)
    assert _fix(spark, "Ã\xa0 la carte") == "à la carte"


def test_fix_encoding_strips_control_chars_and_collapses_ws(spark):
    assert _fix(spark, "a\x07b\x1b  c\x00") == "a b c"


def test_fix_encoding_strips_c1_controls(spark):
    # U+0080-U+009F — where latin1-misdecoded crawl bytes land; without
    # this, C1-polluted duplicate variants fingerprint apart
    assert _fix(spark, "a\x85b\x90 c\x9f") == "a b c"
    # \x9d PRECEDED by 'â€' is the mojibake curly quote — pair wins
    assert _fix(spark, "â€\x9dquoted") == '"quoted'


def test_fix_encoding_nbsp_artifact(spark):
    assert _fix(spark, "oneÂ two") == "one two"


def test_fix_encoding_clean_text_unchanged(spark):
    assert _fix(spark, "already clean text") == "already clean text"


def test_fix_encoding_idempotent(spark):
    once = _fix(spark, "CafÃ© â€” a\x07b Â\xa0 end")
    assert _fix(spark, once) == once


def test_fix_mojibake_preserves_case_and_real_unicode(spark):
    df = spark.createDataFrame([("Déjà Vu â€” OK",)], ["t"])
    out = df.select(fix_mojibake(F.col("t")).alias("f")).collect()[0]["f"]
    assert out == "Déjà Vu - OK"


def test_fix_encoding_merges_corruption_variants(spark):
    # the corpus_dedup_encoding property at unit scale: three disguises
    # of one logical text -> three raw fingerprints, ONE repaired one
    from automated_datastore_discovery_with_aws_glue_spark.operators.text import (
        fingerprint,
    )

    variants = ["CafÃ© â€” body", "CafÃ©\x07 â€”\x1b body", "CafÃ©Â\xa0â€”Â body"]
    df = spark.createDataFrame([(v,) for v in variants], ["t"])
    out = df.select(
        fingerprint(F.col("t")).alias("raw"),
        fingerprint(fix_encoding(F.col("t"))).alias("fixed"),
    ).collect()
    assert len({r["raw"] for r in out}) == 3
    assert len({r["fixed"] for r in out}) == 1


def test_stream_url_dedup_first_sighting_wins(spark, tmp_path):
    """Crawl-frontier dedup: raw URLs that canonicalize to the same
    page emit once across micro-batches (bounded watermark state);
    unparseable URLs are dropped; re-crawls within the horizon are
    suppressed on restart from the checkpoint."""
    import json as _json
    import os

    from automated_datastore_discovery_with_aws_glue_spark.streaming.dedup import (
        stream_url_dedup,
    )

    src, ckpt = str(tmp_path / "pages"), str(tmp_path / "ckpt")
    os.makedirs(src)

    def write_batch(rows):
        with open(f"{src}/b{len(os.listdir(src))}.json", "w") as fh:
            for pid, url, ts in rows:
                fh.write(_json.dumps({"page_id": pid, "url": url, "ts": ts}) + "\n")

    write_batch(
        [
            (1, "http://www.A.com/p/", "2024-01-01 10:00:00"),
            (2, "HTTP://a.com:80/p?utm_source=z", "2024-01-01 10:00:30"),  # dup of 1
            (3, "https://a.com/p", "2024-01-01 10:01:00"),  # https != http
            (4, "not a url", "2024-01-01 10:01:10"),  # quarantined
        ]
    )
    stream = spark.readStream.schema("page_id bigint, url string, ts timestamp").json(src)
    out: list[int] = []

    def run():
        q = (
            stream_url_dedup(stream)
            .writeStream.foreachBatch(
                lambda b, _: out.extend(r["page_id"] for r in b.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream did not finish in time"

    run()
    assert sorted(out) == [1, 3]

    # restart: a re-crawl of page 1 within the horizon stays suppressed
    write_batch([(5, "http://a.com/p", "2024-01-01 10:02:00"), (6, "http://b.com/", "2024-01-01 10:02:30")])
    run()
    assert sorted(out) == [1, 3, 6]


# -- robots.txt ---------------------------------------------------------


def _rules(spark, robots):
    df = spark.createDataFrame([("h", robots)], ["host", "robots"])
    return {
        (r["rule"], r["prefix"])
        for r in W.robots_rules(df, "host", "robots").collect()
    }


def test_robots_rules_star_group_and_comments(spark):
    txt = (
        "# crawl policy\nUser-agent: bot\nDisallow: /private\n\n"
        "User-agent: *\nDisallow: /p/1  # inline comment\nAllow: /p/12\n"
    )
    assert _rules(spark, txt) == {("disallow", "/p/1"), ("allow", "/p/12")}


def test_robots_rules_consecutive_ua_lines_share_group(spark):
    txt = "User-agent: googlebot\nUser-agent: *\nDisallow: /x\n"
    assert _rules(spark, txt) == {("disallow", "/x")}


def test_robots_rules_no_star_group_or_empty_disallow(spark):
    assert _rules(spark, "User-agent: bot\nDisallow: /\n") == set()
    # empty Disallow in the star group = allow-everything, no rule
    assert _rules(spark, "User-agent: *\nDisallow:\n") == set()


def test_robots_filter_precedence(spark):
    pages = spark.createDataFrame(
        [
            (1, "h", "/p/1/deep"),   # /p/1 disallow wins (only match)
            (2, "h", "/p/12/x"),     # longer allow beats /p/1
            (3, "h", "/p/2"),        # equal-length tie -> allow wins
            (4, "h", "/other"),      # no match -> allowed
            (5, "g", "/p/1"),        # host without rules -> allowed
        ],
        ["id", "host", "path"],
    )
    rules = spark.createDataFrame(
        [
            ("h", "disallow", "/p/1"),
            ("h", "allow", "/p/12"),
            ("h", "allow", "/p/2"),
            ("h", "disallow", "/p/2"),
        ],
        ["host", "rule", "prefix"],
    )
    out = {
        r["id"]: (r["allowed"], r["matched_prefix"])
        for r in W.robots_filter(pages, rules, id_col="id").collect()
    }
    assert out == {
        1: (False, "/p/1"),
        2: (True, "/p/12"),
        3: (True, "/p/2"),
        4: (True, None),
        5: (True, None),
    }


def test_robots_rep_wildcards_and_anchor(spark):
    # RFC 9309 path wildcards: '*' = any span, trailing '$' = anchor,
    # precedence by rule OCTET COUNT (wildcards included), allow wins
    # ties; rules see the raw path-and-query target
    pages = spark.createDataFrame(
        [
            (1, "h", "/p/13?gclid=g1"),   # query wildcard beats /p/1
            (2, "h", "/p/13"),            # anchored allow frees exactly this
            (3, "h", "/p/13/"),           # anchor fails -> /p/1 blocks
            (4, "h", "/p/99"),            # mid-path any-span
            (5, "h", "/p/9"),             # '*' must match >= 0 BUT needs the 9
            (6, "h", "/x?a=1&sessionid=7"),  # the classic session-id rule
        ],
        ["id", "host", "target"],
    )
    rules = spark.createDataFrame(
        [
            ("h", "disallow", "/p/1"),
            ("h", "allow", "/p/13$"),
            ("h", "disallow", "/*?gclid="),
            ("h", "disallow", "/p/9*9"),
            ("h", "disallow", "/*?*sessionid="),
        ],
        ["host", "rule", "prefix"],
    )
    out = {
        r["id"]: (r["allowed"], r["matched_prefix"])
        for r in W.robots_filter(
            pages, rules, id_col="id", path_col="target"
        ).collect()
    }
    assert out == {
        1: (False, "/*?gclid="),
        2: (True, "/p/13$"),
        3: (False, "/p/1"),
        4: (False, "/p/9*9"),
        5: (True, None),
        6: (False, "/*?*sessionid="),
    }


def test_rep_pattern_compile_goldens(spark):
    df = spark.createDataFrame(
        [("/*?gclid=",), ("/p/13$",), ("/p/9*9",), ("/a.b$",), ("/p/1",)],
        ["p"],
    )
    got = {
        r["p"]: (r["pat"], r["w"])
        for r in df.select(
            "p",
            W.rep_pattern(F.col("p")).alias("pat"),
            W.rep_is_wildcard(F.col("p")).alias("w"),
        ).collect()
    }
    assert got == {
        "/*?gclid=": ("^/.*\\?gclid=", True),
        "/p/13$": ("^/p/13$", True),
        "/p/9*9": ("^/p/9.*9", True),
        "/a.b$": ("^/a\\.b$", True),  # the '.' is escaped, the '$' anchors
        "/p/1": ("^/p/1", False),
    }


def test_url_raw_target_includes_query(spark):
    rows = [
        ("http://a.com/p/?x=1#frag",),
        ("http://a.com/p",),
        ("http://a.com?y=2",),
    ]
    df = spark.createDataFrame(rows, ["u"])
    got = [r["t"] for r in df.select(W.url_raw_target(F.col("u")).alias("t")).collect()]
    assert got == ["/p/?x=1", "/p", "/?y=2"]


def test_robots_directory_rule_needs_raw_path(spark):
    # 'Disallow: /admin/' blocks '/admin/' and '/admin/x' but NOT the
    # slash-collapsed '/admin' — robots match the raw fetch path
    pages = spark.createDataFrame(
        [(1, "h", "/admin/"), (2, "h", "/admin/x"), (3, "h", "/admin")],
        ["id", "host", "path"],
    )
    rules = spark.createDataFrame(
        [("h", "disallow", "/admin/")], ["host", "rule", "prefix"]
    )
    out = {
        r["id"]: r["allowed"]
        for r in W.robots_filter(pages, rules, id_col="id").collect()
    }
    assert out == {1: False, 2: False, 3: True}


def test_url_raw_path_keeps_trailing_slash(spark):
    df = spark.createDataFrame([("http://a.com/p/",), ("http://a.com",)], ["u"])
    got = [
        r["p"] for r in df.select(W.url_raw_path(F.col("u")).alias("p")).collect()
    ]
    assert got == ["/p/", "/"]


# -- sitemap ------------------------------------------------------------


def test_sitemap_locs_extraction_and_unescape(spark):
    xml = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc>  http://a.com/p?x=1&amp;y=2  </loc></url>"
        "<url><LOC>https://b.com/z</LOC></url>"
        "<url><loc>http://c.com/&amp;amp;literal</loc></url>"
        "</urlset>"
    )
    df = spark.createDataFrame([(xml,)], ["s"])
    locs = df.select(W.sitemap_locs(F.col("s")).alias("l")).collect()[0]["l"]
    # whitespace trimmed, &amp; decoded ONE level (the '&amp;amp;' loc
    # keeps its literal '&amp;'), uppercase tag matched
    assert locs == [
        "http://a.com/p?x=1&y=2",
        "https://b.com/z",
        "http://c.com/&amp;literal",
    ]


def test_sitemap_locs_empty_and_malformed(spark):
    df = spark.createDataFrame(
        [("no sitemap here",), ("<urlset><url></url></urlset>",)], ["s"]
    )
    got = [r["l"] for r in df.select(W.sitemap_locs(F.col("s")).alias("l")).collect()]
    assert got == [[], []]


def test_web_ingest_stream_composition(spark, tmp_path):
    """r12 (VERDICT r11 item 5): the foreachBatch web-ingest twin —
    repair -> token gate -> canonical frontier dedup -> robots gate
    (wildcards included) -> MERGE commit; checkpoint restart keeps
    in-horizon re-crawls suppressed and the MERGE key suppresses them
    forever."""
    import json as _json
    import os

    from automated_datastore_discovery_with_aws_glue_spark.state.store import ParquetStateStore
    from automated_datastore_discovery_with_aws_glue_spark.streaming.web_ingest import (
        web_ingest_stream,
    )

    src, ckpt = str(tmp_path / "pages"), str(tmp_path / "ckpt")
    os.makedirs(src)
    store = ParquetStateStore(spark, str(tmp_path / "store"))
    rules = spark.createDataFrame(
        [("a.com", "disallow", "/admin/"), ("a.com", "disallow", "/*?gclid=")],
        ["host", "rule", "prefix"],
    )
    long = "one two three four five"

    def write_batch(rows):
        with open(f"{src}/b{len(os.listdir(src))}.json", "w") as fh:
            for pid, url, text, ts in rows:
                fh.write(
                    _json.dumps({"page_id": pid, "url": url, "text": text, "ts": ts})
                    + "\n"
                )

    def run():
        q = web_ingest_stream(
            spark.readStream.schema(
                "page_id bigint, url string, text string, ts timestamp"
            ).json(src),
            rules,
            store,
            "frontier",
            ckpt,
        )
        assert q.awaitTermination(120), "stream did not finish in time"

    write_batch(
        [
            (1, "http://a.com/p/9", long, "2024-01-01 10:00:00"),
            # pct disguise of page 1's canonical -> frontier dedup
            (2, "http://www.a.com/%70/9?utm_source=z", long, "2024-01-01 10:00:10"),
            # robots: literal directory rule
            (3, "http://a.com/admin/x", long, "2024-01-01 10:00:20"),
            # robots: REP query wildcard
            (4, "http://a.com/q?gclid=g1", long, "2024-01-01 10:00:30"),
            # below the token gate
            (5, "http://a.com/r", "tiny", "2024-01-01 10:00:40"),
            # unparseable -> NULL-quarantined at the dedup stage
            (6, "not a url", long, "2024-01-01 10:00:50"),
            # mojibake text: repair runs BEFORE the gate (and is stored)
            (7, "http://b.com/ok", "CafÃ© â€” body text here", "2024-01-01 10:01:00"),
        ]
    )
    run()
    rows = {r["page_id"]: r for r in store.read("frontier").collect()}
    assert set(rows) == {1, 7}
    assert rows[1]["url_norm"] == "http://a.com/p/9"
    assert rows[7]["clean_text"] == "Café - body text here"

    # restart from the checkpoint: the in-horizon re-crawl of page 1
    # stays suppressed by watermark state; a brand-new URL lands
    write_batch(
        [
            (8, "http://a.com/p/9?fbclid=x", long, "2024-01-01 10:02:00"),
            (9, "http://a.com/p/10", long, "2024-01-01 10:02:10"),
        ]
    )
    run()
    rows = {r["page_id"]: r for r in store.read("frontier").collect()}
    assert set(rows) == {1, 7, 9}

    # a replayed/late duplicate AFTER the horizon re-emits from the
    # watermark state, but the MERGE key still suppresses it forever
    write_batch([(10, "http://a.com/p/9", long, "2024-01-01 11:00:00")])
    run()
    rows = {r["page_id"]: r for r in store.read("frontier").collect()}
    assert set(rows) == {1, 7, 9}


def test_robots_crawl_delay_group_scoped_and_min(spark):
    # group-scoped: only the star group's delay binds; minimum wins
    # across duplicates; unparseable values ignored; fractional -> ms
    txt = (
        "User-agent: bot\nCrawl-delay: 9\nDisallow: /\n\n"
        "User-agent: *\nDisallow: /x\nCrawl-delay: 2.5\nCrawl-delay: 1.5\n"
        "Crawl-delay: soon\n"
    )
    df = spark.createDataFrame([("h", txt), ("g", "User-agent: bot\nCrawl-delay: 9\n")], ["host", "robots"])
    from automated_datastore_discovery_with_aws_glue_spark.operators.web import robots_crawl_delay

    got = {r["host"]: r["crawl_delay_ms"] for r in robots_crawl_delay(df, "host", "robots").collect()}
    # 'g' has no star group -> no row at all
    assert got == {"h": 1500}


def test_robots_sitemaps_group_independent_ordered(spark):
    # Sitemap: lines apply file-wide (even inside a non-star group),
    # case-insensitive directive name, comments stripped, doc order
    txt = (
        "User-agent: bot\nSitemap: http://a.com/s1.xml\nDisallow: /\n\n"
        "User-agent: *\nDisallow: /x\n"
        "sitemap: http://a.com/s2.xml  # mirror\n"
        "SITEMAP: https://cdn.example/s3.xml\nSitemap:\n"
    )
    df = spark.createDataFrame([("h", txt)], ["host", "robots"])
    from automated_datastore_discovery_with_aws_glue_spark.operators.web import robots_sitemaps

    got = [
        (r["sm_idx"], r["sitemap_url"])
        for r in robots_sitemaps(df, "host", "robots").orderBy("sm_idx").collect()
    ]
    assert got == [
        (0, "http://a.com/s1.xml"),
        (1, "http://a.com/s2.xml"),
        (2, "https://cdn.example/s3.xml"),
    ]


def test_robots_filter_matches_in_percent_normalized_space(spark):
    # rule and target both decode unreserved escapes before matching;
    # reserved escapes (%2F) stay escapes on both sides; an invalid
    # escape falls back to raw bytes
    pages = spark.createDataFrame(
        [
            (1, "h", "/%70/1"),      # decodes to /p/1 -> blocked
            (2, "h", "/p/12"),        # plain target vs escaped rule
            (3, "h", "/a%2Fb"),       # encoded slash is NOT /a/b
            (4, "h", "/a/b"),
            (5, "h", "/%zz"),         # invalid escape -> raw match
        ],
        ["id", "host", "target"],
    )
    rules = spark.createDataFrame(
        [
            ("h", "disallow", "/p/1"),
            ("h", "allow", "/%70/12"),   # escaped rule, longer octets win
            ("h", "disallow", "/a/b"),
            ("h", "disallow", "/%zz"),
        ],
        ["host", "rule", "prefix"],
    )
    out = {
        r["id"]: (r["allowed"], r["matched_prefix"])
        for r in W.robots_filter(
            pages, rules, id_col="id", path_col="target"
        ).collect()
    }
    assert out == {
        1: (False, "/p/1"),
        2: (True, "/%70/12"),  # matched_prefix reports the rule AS WRITTEN
        3: (True, None),       # %2F does not decode into the /a/b rule
        4: (False, "/a/b"),
        5: (False, "/%zz"),
    }


def test_robots_crawl_delay_floors_fractional_ms(spark):
    # 1.9996 s = 1999.6 ms: an int CAST truncates in Spark but rounds
    # half-to-even in DuckDB — the operator floors EXPLICITLY so both
    # engines agree on 1999, never 2000
    txt = "User-agent: *\nCrawl-delay: 1.9996\n"
    df = spark.createDataFrame([("h", txt)], ["host", "robots"])
    from automated_datastore_discovery_with_aws_glue_spark.operators.web import robots_crawl_delay

    [r] = robots_crawl_delay(df, "host", "robots").collect()
    assert r["crawl_delay_ms"] == 1999


def test_robots_filter_octet_precedence_multibyte(spark):
    # RFC 9309 ranks by OCTETS of the rule as written: 'Allow: /€€' is
    # 3 chars / 7 octets, 'Disallow: /€*1' is 4 chars / 6 octets — on a
    # '/€€/…1…' target character ranking blocks, octet ranking allows
    pages = spark.createDataFrame(
        [(1, "h", "/€€/31"), (2, "h", "/€€/25")], ["id", "host", "target"]
    )
    rules = spark.createDataFrame(
        [("h", "allow", "/€€"), ("h", "disallow", "/€*1")],
        ["host", "rule", "prefix"],
    )
    out = {
        r["id"]: (r["allowed"], r["matched_prefix"])
        for r in W.robots_filter(
            pages, rules, id_col="id", path_col="target"
        ).collect()
    }
    # page 1 matches BOTH rules; the 7-octet allow out-ranks the
    # 6-octet wildcard disallow. page 2 matches only the allow.
    assert out == {1: (True, "/€€"), 2: (True, "/€€")}


def test_sitemap_kind_routes_index_vs_urlset(spark):
    idx = (
        '<?xml version="1.0"?><sitemapindex><sitemap>'
        "<loc>https://h/maps/a.xml</loc></sitemap></sitemapindex>"
    )
    us = "<urlset><url><loc>https://h/p/1</loc></url></urlset>"
    df = spark.createDataFrame([(1, idx), (2, us)], ["i", "body"])
    got = {
        r["i"]: (r["kind"], r["locs"])
        for r in df.select(
            "i",
            W.sitemap_kind(F.col("body")).alias("kind"),
            W.sitemap_locs(F.col("body")).alias("locs"),
        ).collect()
    }
    # the SAME <loc> extractor runs on both shapes; kind decides whether
    # the locs are child sitemaps to fetch or page URLs to classify
    assert got == {
        1: ("index", ["https://h/maps/a.xml"]),
        2: ("urlset", ["https://h/p/1"]),
    }


def test_gunzip_text_handles_xml_gz_and_plain_and_corrupt(spark):
    import gzip

    xml = "<urlset><url><loc>https://h/p/€1</loc></url></urlset>"
    rows = [
        (1, bytearray(gzip.compress(xml.encode("utf-8")))),
        (2, bytearray(xml.encode("utf-8"))),          # plain utf-8 body
        (3, bytearray(b"\x1f\x8b corrupt not gzip")),  # magic but garbage
        (4, None),
    ]
    df = spark.createDataFrame(rows, "i int, body binary")
    from automated_datastore_discovery_with_aws_glue_spark.sources.warc import gunzip_text

    got = {r["i"]: (r["text"], r["gunzip_error"]) for r in gunzip_text(df, "body").collect()}
    assert got[1] == (xml, None)
    assert got[2] == (xml, None)
    assert got[3][0] is None and got[3][1]
    assert got[4] == (None, "NULL body")
    # the decompressed text feeds the same loc extractor
    out = gunzip_text(df, "body").select(W.sitemap_locs(F.col("text")).alias("l"))
    assert out.collect()[0]["l"] == ["https://h/p/€1"]


def test_idn_fold_one_key_for_unicode_and_punycode(spark):
    rows = [
        (1, "münchen.de"),
        (2, "xn--mnchen-3ya.de"),
        (3, "MÜNCHEN.DE"),
        (4, "example.com"),          # ascii fast path, never folds
        (5, "münchen.de:8443"),      # explicit port preserved
        (6, "x" * 70 + "ü.de"),     # unfoldable label -> NULL quarantine
        (7, None),
        (8, "example.com."),         # DNS root dot, ASCII path (r14)
        (9, "münchen.de."),          # DNS root dot, Unicode path (r14)
        (10, "example.com.:8080"),   # root dot BEFORE an explicit port
    ]
    df = spark.createDataFrame(rows, ["id", "host"])
    got = {r["id"]: r["folded"] for r in W.idn_fold(df, "host", out="folded").collect()}
    # the blocklist-bypass pin: all three spellings are ONE key
    assert got[1] == got[2] == got[3] == "xn--mnchen-3ya.de"
    assert got[4] == "example.com"
    assert got[5] == "xn--mnchen-3ya.de:8443"
    assert got[6] is None and got[7] is None
    # the root-dot respelling folds onto the SAME key on BOTH script
    # paths (ADVICE r13: it used to stay distinct on ASCII and
    # quarantine on Unicode — asymmetric and bypassable)
    assert got[8] == "example.com"
    assert got[9] == "xn--mnchen-3ya.de"
    assert got[10] == "example.com:8080"
    # the pure kernel agrees (shared implementation, oracle follows)
    assert W.fold_host("example.com.") == "example.com"
    assert W.fold_host("münchen.de.") == "xn--mnchen-3ya.de"
    assert W.fold_host("example.com.:8080") == "example.com:8080"
    # and the folded key actually merges a dedup group
    n = (
        W.idn_fold(df.filter(F.col("host").isNotNull()), "host", out="folded")
        .groupBy("folded")
        .count()
        .filter(F.col("folded") == "xn--mnchen-3ya.de")
        .collect()[0]["count"]
    )
    assert n == 4  # rows 1/2/3 plus the root-dot row 9


def test_psl_join_full_registry_scale_stays_broadcast_only(spark):
    # the "table size is a broadcast-size question" claim as an
    # executed fact: ~10k generated rules across all three forms and
    # four depths must keep the plan broadcast-joins-only (zero
    # shuffle/sort-merge joins) and must not disturb verdicts whose
    # suffixes come from the bundled table
    from automated_datastore_discovery_with_aws_glue_spark.functions.psl import PUBLIC_SUFFIXES

    big = list(PUBLIC_SUFFIXES)
    big += [f"tld{i}x" for i in range(3000)]                 # exact depth 1
    big += [f"s{i}.tld{i % 3000}x" for i in range(4000)]     # exact depth 2
    big += [f"*.w{i}.zz" for i in range(2000)]               # wildcard depth 3
    big += [f"!ex{i}.w{i}.zz" for i in range(1000)]          # exception depth 3
    assert len(big) > 10_000
    hosts = [
        "deep.blog.example.co.uk",
        "x.y.proj.github.io",
        "school.k12.ca.us",
        "a.x.ck",
        "www.ck",
        "pupils.x.sch.uk",
        "plain.example.com",
        "host",
        # keys only the GENERATED rules decide
        "a.b.tld7x",
        "q.s9.tld9x",
        "leaf.w5.zz",
        "sub.ex7.w7.zz",
    ]
    df = spark.createDataFrame([(h,) for h in hosts], ["host"])
    small_out = {
        r["host"]: r["domain"]
        for r in W.registered_domain_join(df, "host").collect()
    }
    big_df = W.registered_domain_join(df, "host", suffixes=tuple(big))
    plan = big_df._sc._jvm.PythonSQLUtils.explainString(
        big_df._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    big_out = {r["host"]: r["domain"] for r in big_df.collect()}
    # bundled-table hosts: identical verdicts under the 10k-rule table
    for h in hosts[:8]:
        assert big_out[h] == small_out[h], h
    # generated-rule hosts: each form decides at its own depth
    assert big_out["a.b.tld7x"] == "b.tld7x"
    assert big_out["q.s9.tld9x"] == "q.s9.tld9x"
    # *.w5.zz makes leaf.w5.zz a bare 3-label suffix: no label lies
    # beyond it, so the whole host is returned (the bare-suffix branch)
    assert big_out["leaf.w5.zz"] == "leaf.w5.zz"
    assert big_out["sub.ex7.w7.zz"] == "ex7.w7.zz"  # exception carve-out


def test_warc_ingest_stream_container_to_corpus(spark, tmp_path):
    """r13: the container-in, corpus-out stream — WARC scan + HTTP
    status/charset gate + html_extract feeding the same repair ->
    token gate -> frontier dedup -> robots -> MERGE pipeline;
    checkpoint restart + replay keep the exactly-once effect."""
    import datetime as _dt
    import os

    from automated_datastore_discovery_with_aws_glue_spark.state.store import ParquetStateStore
    from automated_datastore_discovery_with_aws_glue_spark.streaming.web_ingest import (
        warc_ingest_stream,
    )

    def hrec(uri: str, head: bytes, body: bytes) -> bytes:
        msg = head + b"\r\n\r\n" + body
        return (
            f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: {uri}\r\n"
            f"Content-Length: {len(msg)}\r\n\r\n"
        ).encode("utf-8") + msg + b"\r\n\r\n"

    ok = b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8"
    html = "<html><body><p>one two three four five six</p></body></html>".encode()
    src, ckpt = str(tmp_path / "containers"), str(tmp_path / "ckpt")
    os.makedirs(src)
    store = ParquetStateStore(spark, str(tmp_path / "store"))
    rules = spark.createDataFrame(
        [("a.com", "disallow", "/admin/")], ["host", "rule", "prefix"]
    )

    def write_container(recs: bytes, ts: str) -> None:
        spark.createDataFrame(
            [(bytearray(recs), _dt.datetime.fromisoformat(ts))],
            "wdata binary, ts timestamp",
        ).write.mode("append").parquet(src)

    def run() -> None:
        q = warc_ingest_stream(
            spark.readStream.schema("wdata binary, ts timestamp").parquet(src),
            rules,
            store,
            "corpus",
            ckpt,
        )
        assert q.awaitTermination(120), "stream did not finish in time"

    write_container(
        hrec("http://a.com/p/9", ok, html)
        # pct/tracker disguise of the SAME canonical page -> deduped
        + hrec("http://www.a.com/%70/9?utm_source=z", ok, html)
        # robots directory rule blocks it
        + hrec("http://a.com/admin/x", ok, html)
        # the status gate: a 404 body must never become corpus
        + hrec("http://a.com/gone", b"HTTP/1.1 404 Not Found", html)
        # declared latin-1 -> transcoded to utf-8 before extraction
        + hrec(
            "http://b.com/ok",
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=ISO-8859-1",
            "<html><body><p>caf\xe9 r\xe9sum\xe9 words here too</p></body></html>".encode("latin-1"),
        ),
        "2024-01-01 10:00:00",
    )
    run()
    rows = {r["url_norm"]: r for r in store.read("corpus").collect()}
    assert set(rows) == {"http://a.com/p/9", "http://b.com/ok"}
    assert rows["http://b.com/ok"]["clean_text"] == "café résumé words here too"

    # restart from the checkpoint: a replayed container re-inserts
    # nothing (MERGE key), a new page lands
    write_container(
        hrec("http://a.com/p/9", ok, html) + hrec("http://a.com/p/10", ok, html),
        "2024-01-01 11:00:00",
    )
    run()
    assert {r["url_norm"] for r in store.read("corpus").collect()} == {
        "http://a.com/p/9",
        "http://b.com/ok",
        "http://a.com/p/10",
    }


# -- r14: RFC 9309 user-agent group selection --------------------------------


def _agent_rules(spark, robots, agent):
    df = spark.createDataFrame([("h", robots)], ["host", "robots"])
    return {
        (r["rule"], r["prefix"])
        for r in W.robots_rules(df, "host", "robots", agent=agent).collect()
    }


_UA_ROBOTS = (
    "User-agent: googlebot-news\nDisallow: /news\n\n"
    "User-agent: GoogleBot\nDisallow: /gb\n\n"
    "User-agent: bingbot\nDisallow: /bing\n\n"
    "User-agent: *\nDisallow: /generic\n\n"
    "User-agent: googlebot\nAllow: /gb/ok\n"
)


def test_robots_rules_agent_specific_beats_star(spark):
    # a token-carrying crawler must obey ITS group, not the * group
    assert _agent_rules(spark, _UA_ROBOTS, "bingbot") == {("disallow", "/bing")}
    # no specific group matches -> * is the fallback
    assert _agent_rules(spark, _UA_ROBOTS, "duckbot") == {("disallow", "/generic")}
    # agent=None keeps the generic-crawler behavior
    df = spark.createDataFrame([("h", _UA_ROBOTS)], ["host", "robots"])
    assert {
        (r["rule"], r["prefix"]) for r in W.robots_rules(df, "host", "robots").collect()
    } == {("disallow", "/generic")}


def test_robots_rules_agent_longest_match_and_merge(spark):
    # 'googlebot-news' matches BOTH 'googlebot-news' (14) and
    # 'googlebot' (9): longest wins, the shorter group does NOT bind
    assert _agent_rules(spark, _UA_ROBOTS, "googlebot-news") == {("disallow", "/news")}
    # 'googlebot-images' matches only the 'googlebot' value — and BOTH
    # groups carrying that value merge (RFC: same-agent groups combine)
    assert _agent_rules(spark, _UA_ROBOTS, "googlebot-images") == {
        ("disallow", "/gb"),
        ("allow", "/gb/ok"),
    }
    # matching is case-insensitive in both directions
    assert _agent_rules(spark, _UA_ROBOTS, "GOOGLEBOT-IMAGES") == {
        ("disallow", "/gb"),
        ("allow", "/gb/ok"),
    }
    # the robots value must be a PREFIX of the token, not vice versa:
    # token 'google' does not match group 'googlebot'
    assert _agent_rules(spark, _UA_ROBOTS, "google") == {("disallow", "/generic")}
    # a '*' inside a consecutive-UA-lines group never counts as a
    # specific match, but the group still binds via its named value
    txt = "User-agent: foo\nUser-agent: *\nDisallow: /both\n"
    assert _agent_rules(spark, txt, "foobot") == {("disallow", "/both")}
    assert _agent_rules(spark, txt, "other") == {("disallow", "/both")}


def test_robots_crawl_delay_agent_scoped(spark):
    from automated_datastore_discovery_with_aws_glue_spark.operators.web import robots_crawl_delay

    txt = (
        "User-agent: slowbot\nCrawl-delay: 10\nDisallow: /x\n\n"
        "User-agent: *\nCrawl-delay: 1.5\n"
    )
    df = spark.createDataFrame([("h", txt)], ["host", "robots"])
    got = {r["host"]: r["crawl_delay_ms"] for r in robots_crawl_delay(df, "host", "robots", agent="slowbot").collect()}
    assert got == {"h": 10000}
    got = {r["host"]: r["crawl_delay_ms"] for r in robots_crawl_delay(df, "host", "robots", agent="fastbot").collect()}
    assert got == {"h": 1500}
    # a host whose file names ONLY other bots gives a token crawler no
    # delay row at all (and no rules) — allowed-by-default semantics
    only = "User-agent: bot\nCrawl-delay: 9\nDisallow: /\n"
    df2 = spark.createDataFrame([("h", only)], ["host", "robots"])
    assert robots_crawl_delay(df2, "host", "robots", agent="crawler").count() == 0


# -- r14: relative-reference resolution (the redirect frontier primitive) ----


def test_url_resolve_rfc3986_forms(spark):
    base = "https://ex.com/a/b/page?q=1#frag"
    cases = [
        # absolute passes through untouched
        ("http://other.org/x", "http://other.org/x"),
        # protocol-relative inherits the base scheme
        ("//cdn.ex.com/img", "https://cdn.ex.com/img"),
        # origin-relative
        ("/root/p?z=2", "https://ex.com/root/p?z=2"),
        # path-relative merges onto the base DIRECTORY
        ("sib", "https://ex.com/a/b/sib"),
        ("sib?z=2", "https://ex.com/a/b/sib?z=2"),
        # dot segments collapse; popping past root is absorbed
        ("../up", "https://ex.com/a/up"),
        ("../../../up", "https://ex.com/up"),
        ("./same", "https://ex.com/a/b/same"),
        ("/x/./y/../z", "https://ex.com/x/z"),
        # query-only replaces the base query; fragment-only is the
        # base document without its fragment
        ("?n=9", "https://ex.com/a/b/page?n=9"),
        ("#sec", "https://ex.com/a/b/page?q=1"),
        # a dotty QUERY is data, never path-collapsed
        ("sib?path=../x", "https://ex.com/a/b/sib?path=../x"),
    ]
    rows = [(i, base, ref) for i, (ref, _) in enumerate(cases)]
    df = spark.createDataFrame(rows, ["i", "base", "ref"])
    got = {
        r["i"]: r["out"]
        for r in df.select(
            "i", W.url_resolve(F.col("base"), F.col("ref")).alias("out")
        ).collect()
    }
    for i, (ref, want) in enumerate(cases):
        assert got[i] == want, (ref, got[i], want)


def test_url_resolve_quarantines_and_edge_bases(spark):
    rows = [
        (1, "https://ex.com", "p"),          # empty base path -> root dir
        (2, "https://ex.com/d/", "p"),       # dir base keeps the dir
        (3, "not a url", "/x"),              # unparseable base -> NULL
        (4, "https://ex.com/a", None),       # NULL ref -> NULL
        (5, "https://ex.com/a", ""),         # empty ref -> NULL
    ]
    df = spark.createDataFrame(rows, ["i", "base", "ref"])
    got = {
        r["i"]: r["out"]
        for r in df.select(
            "i", W.url_resolve(F.col("base"), F.col("ref")).alias("out")
        ).collect()
    }
    assert got[1] == "https://ex.com/p"
    assert got[2] == "https://ex.com/d/p"
    assert got[3] is None and got[4] is None and got[5] is None


# -- r14: per-host politeness schedule ----------------------------------------


def test_crawl_schedule_slots_and_default(spark):
    pages = spark.createDataFrame(
        [(1, "a.com"), (3, "a.com"), (2, "a.com"), (10, "b.org"), (11, "c.net")],
        ["doc_id", "host"],
    )
    delays = spark.createDataFrame([("a.com", 1500), ("b.org", 200)],
                                   ["host", "crawl_delay_ms"])
    got = {
        r["doc_id"]: (r["seq"], r["delay_ms"], r["fetch_slot_ms"])
        for r in W.crawl_schedule(pages, delays, id_col="doc_id").collect()
    }
    # per-host order is doc_id; slots are exact integer multiples
    assert got[1] == (1, 1500, 0)
    assert got[2] == (2, 1500, 1500)
    assert got[3] == (3, 1500, 3000)
    assert got[10] == (1, 200, 0)
    # a host with no published delay gets the polite default
    assert got[11] == (1, 1000, 0)
    # output-column collisions are loud
    import pytest

    with pytest.raises(ValueError, match="seq"):
        W.crawl_schedule(pages.withColumn("seq", F.lit(1)), delays, id_col="doc_id")


def test_crawl_schedule_partitions_by_host_only(spark):
    # one mega-host must not serialize the PLAN: the window partitions
    # by the host key alone (mega-host rows serialize within their own
    # partition — inherent to a per-host schedule — while every other
    # host proceeds in parallel), and the delay join stays broadcast
    import pyspark.sql.functions as SF

    pages = spark.range(0, 10000).select(
        SF.col("id").alias("doc_id"),
        SF.when(SF.col("id") % 10 < 8, SF.lit("mega.com"))
        .otherwise(SF.concat(SF.lit("h"), (SF.col("id") % 97).cast("string")))
        .alias("host"),
    )
    delays = spark.createDataFrame([("mega.com", 100)], ["host", "crawl_delay_ms"])
    out = W.crawl_schedule(pages, delays, id_col="doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(host" in plan
    # no single-partition (global) exchange anywhere in the plan
    assert "SinglePartition" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan
    # and the schedule itself is correct on the mega host
    mega = out.filter(SF.col("host") == "mega.com").orderBy("seq").limit(3).collect()
    assert [(r["seq"], r["fetch_slot_ms"]) for r in mega] == [(1, 0), (2, 100), (3, 200)]


# -- r14b: multi-hop redirect resolution --------------------------------------


def test_redirect_chains_multihop_loop_cap(spark):
    edges = [
        ("a", "b"), ("b", "c"), ("c", "d"),  # 3-hop chain resolving at d
        ("self", "self"),                      # immediate self-loop
        ("x", "y"), ("y", "x"),                # 2-cycle
        # 5-edge chain: from l1 the walk is still unresolved at 4 hops
        ("l1", "l2"), ("l2", "l3"), ("l3", "l4"), ("l4", "l5"), ("l5", "l6"),
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["start"]: (r["final_url"], r["n_hops"], r["status"])
        for r in W.redirect_chains(df, max_hops=4).collect()
    }
    assert got["a"] == ("d", 3, "ok")
    assert got["b"] == ("d", 2, "ok")
    assert got["c"] == ("d", 1, "ok")
    assert got["self"] == ("self", 1, "loop")
    # both cycle members detect the loop (x -> y -> x)
    assert got["x"] == ("x", 2, "loop")
    assert got["y"] == ("y", 2, "loop")
    # l1 is still on a node WITH an outgoing edge at the cap
    assert got["l1"] == ("l5", 4, "cap")
    # l2 resolves EXACTLY at the cap (l6 has no outgoing edge)
    assert got["l2"] == ("l6", 4, "ok")
    assert got["l3"] == ("l6", 3, "ok")
    assert got["l4"] == ("l6", 2, "ok")
    assert got["l5"] == ("l6", 1, "ok")
    # one row per DISTINCT source (a b c self x y l1..l5)
    assert len(got) == 11


# -- r14b: in-page anchor extraction ------------------------------------------


def test_extract_anchors_forms(spark):
    html = (
        '<p>x</p><a href="/dq">a</a>'
        "<A HREF='/sq' rel='nofollow'>b</A>"
        '<a rel="NOFOLLOW external" href="https://e.com/p">c</a>'
        "<a name=\"no-href\">d</a>"
        '<a href="">e</a>'
        '<a href="#frag">f</a>'
    )
    df = spark.createDataFrame([(html,)], ["h"])
    got = df.select(F.explode(W.extract_anchors(F.col("h"))).alias("a")).select(
        "a.href", "a.nofollow"
    ).collect()
    assert [(r["href"], r["nofollow"]) for r in got] == [
        ("/dq", False),
        ("/sq", True),           # single-quoted href, single-quoted rel
        ("https://e.com/p", True),  # nofollow as one token among several
        ("", False),             # no href attribute -> empty
        ("", False),             # explicitly empty href
        ("#frag", False),        # fragment-only passes through (callers gate)
    ]
    # a page with no anchors extracts an empty array, not NULL
    none = spark.createDataFrame([("<p>plain</p>",)], ["h"]).select(
        F.size(W.extract_anchors(F.col("h"))).alias("n")
    ).collect()
    assert none[0]["n"] == 0


def test_host_rank_edge_gate(spark):
    from automated_datastore_discovery_with_aws_glue_spark.plans.web_pipeline import corpus_host_rank

    out = corpus_host_rank(spark, "/root/testdata/sf0.001").collect()
    nodes = {r["node"] for r in out}
    # the nofollow-only target confers/receives no rank: not a node
    assert "ads.example" not in nodes
    # the dangling CDN host IS ranked (it receives edges, emits none)
    assert "cdn.example" in nodes
    assert {f"site{i}.example" for i in range(7)} <= nodes
    # every host links to the CDN, so the pure sink out-ranks any
    # single ring member (which only its one predecessor feeds)
    ranks = {r["node"]: r["rank_mass"] for r in out}
    assert ranks["cdn.example"] > max(ranks[f"site{i}.example"] for i in range(7))


def test_crawl_cycle_gates_and_schedule(spark):
    from automated_datastore_discovery_with_aws_glue_spark.plans.web_pipeline import corpus_crawl_cycle

    out = corpus_crawl_cycle(spark, "/root/testdata/sf0.001").collect()
    rows = {r["url"]: r for r in out}
    # known self-pages carry the flag and are never scheduled
    known = [r for r in out if r["known"]]
    assert known and all(r["seq"] is None for r in known)
    # the CDN deny-all: discovered, reported, never scheduled
    cdn = [r for r in out if r["host"] == "cdn.example"]
    assert cdn and all(not r["allowed"] and r["seq"] is None for r in cdn)
    assert all(r["matched_prefix"] == "/" for r in cdn)
    # class-1 hosts (site1/site4): /local/1* carved back out of the
    # /local/ block by longest-rule precedence
    loc = [r for r in out if r["host"] == "site1.example" and "/local/" in r["url"]]
    assert loc
    for r in loc:
        path1 = r["url"].split(".example")[1].startswith("/local/1")
        assert r["allowed"] == path1
        assert r["matched_prefix"] == ("/local/1" if path1 else "/local/")
    # class-2 hosts (site2/site5): *.html$ blocks rel pages but must
    # NOT match an .html target carrying a ?query
    html_block = [
        r for r in out if r["host"] == "site2.example" and r["url"].endswith(".html")
        and not r["known"]
    ]
    assert html_block and all(not r["allowed"] for r in html_block)
    q2 = [r for r in out if r["host"] == "site2.example" and "?page=2" in r["url"]]
    assert q2 and all(r["allowed"] and r["seq"] is not None for r in q2)
    # schedule math: slots are (seq-1)*delay in exact ms, per host;
    # class-0 hosts declare 1.5s, class-1 none (default 1000), class-2 2s
    sched = [r for r in out if r["seq"] is not None]
    assert sched
    for r in sched:
        assert r["fetch_slot_ms"] == (r["seq"] - 1) * r["delay_ms"]
        if r["host"].startswith("site"):
            i = int(r["host"][4])
            assert r["delay_ms"] == {0: 1500, 1: 1000, 2: 2000}[i % 3]
        else:
            # mirror hosts publish no robots file: everything allowed,
            # default politeness delay
            assert r["host"].startswith("mirror")
            assert r["allowed"] and r["matched_prefix"] is None
            assert r["delay_ms"] == 1000
    # the <base href> arm routes BOTH its anchors (path- and
    # origin-relative) onto the mirror host, never the page's own
    mirror = [r for r in out if r["host"].startswith("mirror")]
    assert mirror
    assert {u.split(".example")[1].split("/")[1] for u in (r["url"] for r in mirror)} == {"m", "root"}
    # the hub arm concentrates discovery: hub URLs carry n_refs > 1
    hubs = [r for r in out if r["url"].endswith("/hub")]
    assert hubs and all(r["n_refs"] > 1 for r in hubs)
    # per-host seqs are 1..n without gaps
    from collections import defaultdict
    byhost = defaultdict(list)
    for r in sched:
        byhost[r["host"]].append(r["seq"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in byhost.values())


# -- r14c: base-href and rel=canonical extraction ------------------------------


def test_base_and_canonical_extraction(spark):
    rows = [
        # first <base> wins; canonical in either attribute order
        ('<base href="https://b.example/x/"><base href="/ignored/">'
         '<link rel="canonical" href="/c1">', "https://b.example/x/", "/c1"),
        ("<link href='/c2' rel='canonical'>", "", "/c2"),
        # unrelated link tags never fire
        ('<link rel="stylesheet" href="/css/x.css">', "", ""),
        ("<p>no head markup at all</p>", "", ""),
    ]
    df = spark.createDataFrame([(h,) for h, _, _ in rows], ["h"])
    got = df.select(
        W.base_href(F.col("h")).alias("b"),
        W.canonical_href(F.col("h")).alias("c"),
    ).collect()
    assert [(r["b"], r["c"]) for r in got] == [(b, c) for _, b, c in rows]


def test_canonical_dedup_groups(spark):
    from automated_datastore_discovery_with_aws_glue_spark.plans.web_pipeline import (
        corpus_canonical_dedup,
    )

    out = corpus_canonical_dedup(spark, "/root/testdata/sf0.001").collect()
    # undeclared pages (the no-link and stylesheet-only arms) key on
    # themselves: declared False, self-canonical, singleton groups
    undecl = [r for r in out if not r["declared"]]
    assert undecl and all(r["is_self"] and r["dup_count"] == 1 and r["keep"] for r in undecl)
    # the syndication arm: cross-host canon.example groups collapse,
    # exactly ONE kept survivor per group, the lexicographic first
    synd = [r for r in out if "canon.example" in r["canonical_url"]]
    assert synd and all(not r["is_self"] for r in synd)
    from collections import defaultdict
    groups = defaultdict(list)
    for r in synd:
        groups[r["canonical_url"]].append(r)
    assert any(len(v) > 1 for v in groups.values())
    for v in groups.values():
        assert sum(r["keep"] for r in v) == 1
        assert min(r["page_url"] for r in v) == next(r["page_url"] for r in v if r["keep"])
        assert all(r["dup_count"] == len(v) for r in v)
    # the path-relative self-canonical arm declares AND is self
    selfs = [r for r in out if r["declared"] and r["is_self"]]
    assert selfs
