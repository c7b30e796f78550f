import pyspark.sql.functions as F


def test_url_functions(spark):
    from html5ever_elixir_spark.functions import (
        host_of,
        normalize_url,
        registered_domain,
    )

    df = spark.createDataFrame(
        [
            ("https://Sub.Example.COM:443/a/b/?q=1#frag",),
            ("http://user@host7.example:80/page/",),
            ("https://example.com",),
            ("not a url",),
        ],
        "url string",
    )
    out = df.select(
        host_of("url").alias("h"),
        registered_domain("url").alias("d"),
        normalize_url("url").alias("n"),
    ).collect()
    assert out[0].h == "sub.example.com:443".split(":")[0] or out[0].h == "sub.example.com"
    assert out[0].d == "example.com"
    assert out[0].n == "https://sub.example.com/a/b/?q=1"
    assert out[1].h == "host7.example"
    assert out[1].n == "http://host7.example/page"
    assert out[2].n == "https://example.com/"
    assert out[3].h == ""
