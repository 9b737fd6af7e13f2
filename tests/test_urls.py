"""URL canonicalization + host curation (ops/urls.py)."""

import pyarrow as pa
import pytest

import ray

from docstrange_ray.ops.urls import (
    canonicalize_url,
    canonicalize_urls,
    host_cap,
    host_stats,
    url_dedup_keep_first,
    url_host,
)

pytestmark = pytest.mark.usefixtures("ray_session")


class TestCanonicalizeUrl:
    def test_fragment_dropped(self):
        assert canonicalize_url("http://a.com/x#frag") == "http://a.com/x"

    def test_scheme_and_host_lowercased_path_case_preserved(self):
        assert (
            canonicalize_url("HTTPS://WWW.Site.COM/Path/File.HTML")
            == "https://www.site.com/Path/File.HTML"
        )

    def test_default_ports_stripped(self):
        assert canonicalize_url("http://a.com:80/x") == "http://a.com/x"
        assert canonicalize_url("https://a.com:443/x") == "https://a.com/x"
        # non-default port survives
        assert canonicalize_url("http://a.com:8080/x") == "http://a.com:8080/x"
        # :443 is only default for https
        assert canonicalize_url("http://a.com:443/x") == "http://a.com:443/x"

    def test_query_params_sorted(self):
        assert (
            canonicalize_url("http://a.com/x?b=2&a=1&c=3")
            == "http://a.com/x?a=1&b=2&c=3"
        )

    def test_empty_query_dropped(self):
        assert canonicalize_url("http://a.com/x?") == "http://a.com/x"

    def test_empty_path_becomes_root(self):
        assert canonicalize_url("http://A.com") == "http://a.com/"
        assert canonicalize_url("http://a.com?b=1") == "http://a.com/?b=1"

    def test_no_scheme(self):
        assert canonicalize_url("A.com/X?b=1&a=2") == "a.com/X?a=2&b=1"

    def test_idempotent(self):
        for u in [
            "HTTP://A.COM:80/Path?z=1&a=2#f",
            "https://b.org",
            "c.net/x",
        ]:
            once = canonicalize_url(u)
            assert canonicalize_url(once) == once

    def test_host_extraction(self):
        assert url_host("HTTPS://WWW.A.com:443/x?q=1") == "www.a.com"
        assert url_host("b.com") == "b.com"


class TestDatasetOps:
    def _ds(self, rows):
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": [r[0] for r in rows],
                    "url": [r[1] for r in rows],
                    "text": [r[2] for r in rows],
                }
            )
        ).repartition(3)

    def test_canonicalize_with_host_column(self):
        ds = self._ds([(1, "HTTP://A.com:80/x#f", "t")])
        row = canonicalize_urls(ds, host_col="host").take_all()[0]
        assert row["url"] == "http://a.com/x"
        assert row["host"] == "a.com"

    def test_url_dedup_keep_first(self):
        rows = [
            (5, "http://a.com/x?b=2&a=1", "later"),
            (2, "HTTP://A.COM/x?a=1&b=2", "first"),
            (9, "http://b.com/y", "only"),
        ]
        got = {
            r["url"]: (r["doc_id"], r["text"])
            for r in url_dedup_keep_first(self._ds(rows)).take_all()
        }
        assert got == {
            "http://a.com/x?a=1&b=2": (2, "first"),
            "http://b.com/y": (9, "only"),
        }

    def test_host_stats(self):
        rows = [
            (1, "http://a.com/1", "xx"),
            (2, "HTTPS://A.COM/2", "yyy"),
            (3, "http://b.com/", "z"),
        ]
        got = {
            r["host"]: (r["n_docs"], r["n_chars"])
            for r in host_stats(self._ds(rows)).take_all()
        }
        assert got == {"a.com": (2, 5), "b.com": (1, 1)}

    def test_host_cap_hot_host(self):
        # 30 docs on one host, 1 on another; cap 3 keeps the 3 lowest ids
        rows = [(i, f"http://hot.com/{i}", "t") for i in range(30)]
        rows += [(99, "http://cold.com/x", "t")]
        kept = sorted(
            r["doc_id"] for r in host_cap(self._ds(rows), cap=3).take_all()
        )
        assert kept == [0, 1, 2, 99]
