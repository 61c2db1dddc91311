

def test_canonical_url_rules_and_dedup(spark):
    from cdc_system_spark.operators.text import canonical_url, url_dedup

    cases = [
        # scheme + www + trailing slash + fragment + tracking params
        (1, "http://WWW.Example.COM/a/b/?utm_source=x&z=1&a=2#frag",
            "https://example.com/a/b?a=2&z=1"),
        (2, "https://example.com/a/b?a=2&z=1",
            "https://example.com/a/b?a=2&z=1"),
        # bare host, no path/query
        (3, "http://www.Example.com/", "https://example.com"),
        # fbclid/gclid/ref dropped; param ORDER normalized
        (4, "https://example.com/x?gclid=9&b=2&ref=nav&a=1&fbclid=z",
            "https://example.com/x?a=1&b=2"),
        # a 'reform=1' param must NOT be eaten by the ref= rule
        (5, "https://example.com/x?reform=1",
            "https://example.com/x?reform=1"),
        # '?' inside a param value: only the FIRST ? starts the query
        (6, "https://example.com/x?a=1?b=2", "https://example.com/x?a=1?b=2"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u, _ in cases], "doc_id long, url string"
    )
    got = {
        r["doc_id"]: r["c"]
        for r in df.select("doc_id", canonical_url("url").alias("c")).collect()
    }
    for i, _, want in cases:
        assert got[i] == want, (i, got[i])
    # dedup keeps the smallest id per canonical form (1 and 2 collide)
    survivors = url_dedup(df, "url")
    assert {r["doc_id"] for r in survivors.collect()} == {1, 3, 4, 5, 6}
    assert "canonical_url" in survivors.columns
