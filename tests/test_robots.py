

# ---------------------------------------------------------------------------
# Sitemap: directive discovery
# ---------------------------------------------------------------------------

def test_sitemap_urls_expr(spark):
    from pyspark.sql import functions as F

    from simplecrawler_spark.operators.robots import sitemap_urls_expr

    texts = [
        (1, "User-agent: *\nDisallow: /x\n"
            "Sitemap: http://a.test/sitemap.xml\n"),
        (2, "sitemap: http://b.test/SM.xml\n"
            "SITEMAP:\thttp://b.test/sm2.xml"),     # case + tab
        (3, "User-agent: *\nDisallow:"),            # none
        (4, "Sitemap: http://c.test/s.xml"),        # first line
        (5, "notasitemap: http://x\nxsitemap: http://y"),  # mid-word
    ]
    df = spark.createDataFrame(texts, "id long, txt string")
    got = {r.id: r.sm for r in df.select(
        "id", sitemap_urls_expr(F.col("txt")).alias("sm")).collect()}
    assert got[1] == ["http://a.test/sitemap.xml"]
    # directive name is case-insensitive, URL case preserved
    assert got[2] == ["http://b.test/SM.xml", "http://b.test/sm2.xml"]
    assert got[3] == []
    assert got[4] == ["http://c.test/s.xml"]
    assert got[5] == []
