"""URL canonicalization: hand-computed variants + map-only plan."""

from pyspark.sql import functions as F

from frogocr_spark.functions.urls import canonical_url, url_domain


def _canon(spark, urls):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "i long, url string")
    rows = df.select("i", canonical_url(F.col("url")).alias("c"),
                     url_domain(F.col("url")).alias("d")) \
        .orderBy("i").collect()
    return [(r.c, r.d) for r in rows]


def test_variants_collapse_to_one_canonical(spark):
    got = _canon(spark, [
        "https://www.w3.example.com/docs/12/?id=12&utm_source=feed",
        "HTTPS://WWW.W3.EXAMPLE.COM:443/docs/12?utm_campaign=x&id=12",
        "https://w3.example.com/docs/12?id=12#sec",
    ])
    assert {c for c, _ in got} == {"https://w3.example.com/docs/12?id=12"}
    assert {d for _, d in got} == {"w3.example.com"}


def test_scheme_distinguishes(spark):
    got = _canon(spark, ["http://a.com/x?id=1", "https://a.com/x?id=1"])
    assert got[0][0] == "http://a.com/x?id=1"
    assert got[1][0] == "https://a.com/x?id=1"


def test_root_and_trailing_slash(spark):
    got = _canon(spark, ["https://a.com/", "https://a.com",
                         "https://a.com///"])
    assert {c for c, _ in got} == {"https://a.com"}


def test_params_sorted_and_tracking_dropped(spark):
    got = _canon(spark, [
        "https://a.com/p?z=1&a=2&ref=x&fbclid=y&gclid=z&utm_medium=m",
        "https://a.com/p?a=2&z=1",
    ])
    assert got[0][0] == got[1][0] == "https://a.com/p?a=2&z=1"


def test_all_params_tracking_drops_query_entirely(spark):
    got = _canon(spark, ["https://a.com/p?utm_source=x&ref=y",
                         "https://a.com/p"])
    assert got[0][0] == got[1][0] == "https://a.com/p"


def test_canonical_url_is_map_only(spark):
    df = spark.createDataFrame([(1, "https://www.a.com/x?b=1&utm_c=2")],
                               "i long, url string")
    out = df.select(canonical_url(F.col("url")).alias("c"))
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_default_ports_dropped_nondefault_kept(spark):
    got = _canon(spark, [
        "https://a.com:443/x?id=1",   # https default → dropped
        "http://a.com:80/x?id=1",     # http default → dropped
        "http://a.com:8080/x?id=1",   # non-default → kept
        "https://a.com:80/x?id=1",    # 80 is NOT https default → kept
    ])
    assert got[0][0] == "https://a.com/x?id=1"
    assert got[1][0] == "http://a.com/x?id=1"
    assert got[2][0] == "http://a.com:8080/x?id=1"
    assert got[3][0] == "https://a.com:80/x?id=1"


def test_canonical_url_randomized_vs_python_twin(spark):
    """200 seeded random well-formed URLs (scheme/www/host/port/path/
    params/fragment all varied) against a pure-Python twin of the
    documented canonical rules.  Constrained to the well-formed subset
    (no userinfo, no IPv6) where java.net.URI parsing and the twin's
    regex split agree by construction."""
    import random
    import re

    def py_canon(url):
        m = re.match(r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)"
                     r"(?:\?([^#]*))?(?:#.*)?$", url)
        scheme = m.group(1).lower()
        auth = m.group(2).lower()
        pm = re.search(r":(\d+)$", auth)
        port = pm.group(1) if pm else ""
        host = re.sub(r"^www\.", "", re.sub(r":\d+$", "", auth))
        if port and not ((scheme == "http" and port == "80")
                         or (scheme == "https" and port == "443")):
            host += ":" + port
        path = re.sub(r"/+$", "", m.group(3) or "")
        q = m.group(4) or ""
        params = sorted(
            p for p in q.split("&")
            if p and not re.match(r"^(utm_[^=]*|ref|fbclid|gclid)=", p))
        return (scheme + "://" + host + path
                + ("?" + "&".join(params) if params else ""))

    rng = random.Random(20260817)
    urls = []
    for _ in range(200):
        scheme = rng.choice(["http", "https", "HTTP", "HTTPS", "Http"])
        www = rng.choice(["", "www.", "WWW."])
        host = rng.choice(["example.com", "A.Example.ORG", "x-y.z.net"])
        port = rng.choice(["", ":80", ":443", ":8080", ":9090"])
        segs = rng.randint(0, 3)
        path = "".join("/" + rng.choice(["a", "B", "docs", "1"])
                       for _ in range(segs))
        path += rng.choice(["", "/", "//"])
        n_params = rng.randint(0, 4)
        params = [rng.choice(["id=1", "z=9", "a=2", "utm_source=x",
                              "ref=y", "fbclid=z", "gclid=1", "b="])
                  for _ in range(n_params)]
        rng.shuffle(params)
        frag = rng.choice(["", "#sec", "#x-1"])
        url = (scheme + "://" + www + host + port + path
               + ("?" + "&".join(params) if params else "") + frag)
        urls.append(url)
    got = _canon(spark, urls)
    for u, (c, _d) in zip(urls, got):
        assert c == py_canon(u), u
