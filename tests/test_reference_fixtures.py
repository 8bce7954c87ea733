"""Reference-shaped integration tests (FIXTURES.md section B): the
impressions/pixels ad-event tables from hustle's own integration-test
suite, inserted as newline-JSON through the full lifecycle, queried
through the DSL, asserted against golden-in-code tuples — the
reference's exact test style (SURVEY section 5)."""

import json

import pytest

import hustle_spark as h


@pytest.fixture(scope="module")
def ad_catalog(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("ad_tables")
    cat = h.connect(spark, root)
    cat.create(
        "impressions",
        [
            "wide index string token",
            "index string date",
            "index uint32 time",
            "index trie url",
            "index string site_id",
            "index uint32 ad_id",
            "index uint32 cpm_millis",
            "lz4 ua",
        ],
        partition="date",
    )
    cat.create(
        "pixels",
        ["index string date", "index string site_id", "index uint32 amount", "index uint32 ad_id"],
        partition="date",
    )
    imps = [
        {"token": "t1", "date": "2014-01-20", "time": 1390219200, "url": "http://e.com/a",
         "site_id": "s1", "ad_id": 30010, "cpm_millis": 4200, "ua": "Mozilla/5.0"},
        {"token": "t2", "date": "2014-01-21", "time": 1390305600, "url": "http://e.com/b",
         "site_id": "s2", "ad_id": 30003, "cpm_millis": 1000, "ua": "curl/7"},
        {"token": "t3", "date": "2014-01-21", "time": 1390305700, "url": "http://e.com/c",
         "site_id": "s1", "ad_id": 30010, "cpm_millis": 2000, "ua": "Mozilla/5.0"},
        {"token": "t4", "date": "2014-01-21", "time": 1390305800, "url": "http://e.com/a",
         "site_id": "s2", "ad_id": 30003, "cpm_millis": 3000, "ua": "x"},
    ]
    pix = [
        {"date": "2014-01-21", "site_id": "s2", "amount": 25, "ad_id": 30003},
        {"date": "2014-01-21", "site_id": "s2", "amount": 75, "ad_id": 30003},
        {"date": "2014-01-21", "site_id": "s9", "amount": 99, "ad_id": 30010},
        {"date": "2014-01-22", "site_id": "s2", "amount": 11, "ad_id": 30003},
    ]
    imp_file = root / "imps.json"
    imp_file.write_text("\n".join(json.dumps(r) for r in imps))
    pix_file = root / "pix.json"
    pix_file.write_text("\n".join(json.dumps(r) for r in pix))
    assert h.insert(cat, "impressions", phile=str(imp_file)) == 4
    assert h.insert(cat, "pixels", phile=str(pix_file)) == 4
    return cat


def test_restrict_agg(ad_catalog):
    # canonical reference query: select(imps.ad_id, h_sum(imps.cpm_millis),
    #                                  where=imps.date > '2014-01-20')
    imps = ad_catalog.table("impressions")
    out = h.select(
        imps.ad_id,
        h.h_sum(imps.cpm_millis).alias("sum"),
        where=imps.date > "2014-01-20",
        order_by=imps.ad_id,
    )
    assert [tuple(r) for r in out.collect()] == [(30003, 4000), (30010, 2000)]


def test_join_on_site(ad_catalog):
    # select(imps.ad_id, h_sum(pix.amount),
    #        where=(imps.date=='2014-01-21', pix.date=='2014-01-21'),
    #        join=(imps.site_id, pix.site_id))
    imps = ad_catalog.table("impressions")
    pix = ad_catalog.table("pixels")
    out = h.select(
        imps.ad_id,
        h.h_sum(pix.amount).alias("sum"),
        where=(imps.date == "2014-01-21", pix.date == "2014-01-21"),
        join=(imps.site_id, pix.site_id),
        order_by=imps.ad_id,
    )
    # two s2 impressions x two s2 pixels: each pixel counted per matching
    # impression row (inner-join bag semantics): (25+75)*2 = 200
    assert [tuple(r) for r in out.collect()] == [(30003, 200)]


def test_distinct_order_limit_isin(ad_catalog):
    imps = ad_catalog.table("impressions")
    out = h.select(
        imps.site_id,
        where=imps.ad_id << [30010, 30003],
        distinct=True,
        order_by=imps.site_id,
        desc=True,
        limit=1,
    )
    assert [r.site_id for r in out.collect()] == ["s2"]


def test_nest_requery(ad_catalog):
    imps = ad_catalog.table("impressions")
    nested = h.select(
        imps.site_id,
        h.h_sum(imps.cpm_millis).alias("spend"),
        nest=True,
    )
    out = h.select(nested.site_id, where=nested.spend > 4000.0)
    assert [r.site_id for r in out.collect()] == ["s1"]


def test_partition_delete_then_query(ad_catalog):
    pix = ad_catalog
    assert pix.partitions("pixels") == ["2014-01-21", "2014-01-22"]
    pix.delete("pixels", where=lambda d: d == "2014-01-22")
    t = pix.table("pixels")
    out = h.select(t.site_id, h.h_count().alias("n"))
    assert [tuple(r) for r in out.collect()] != []
    assert pix.partitions("pixels") == ["2014-01-21"]


def test_empty_table_queryable(spark, tmp_path):
    cat = h.connect(spark, tmp_path)
    cat.create("fresh", ["index string date", "uint32 v"], partition="date")
    cat._cache.clear()  # fresh-session view
    t = cat.table("fresh")
    assert t.df.count() == 0
    assert t.columns == ["date", "v"]
