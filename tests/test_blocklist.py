"""Aho-Corasick blocklist tagger tests.

Reference = brute-force position scan (startswith at every offset) —
the same semantics the SQL oracle uses; agreement pins the automaton.
"""

import random

import numpy as np
import ray

from docstrange_ray.ops.blocklist import AhoCorasick, blocklist_tags


def brute(patterns, text):
    t = (text or "").lower()
    return [
        sum(1 for i in range(len(t)) if t.startswith(p.lower(), i))
        for p in patterns
    ]


class TestAhoCorasick:
    def test_classic_nested_outputs(self):
        # the textbook case: suffix patterns must fire via fail links
        ac = AhoCorasick(["he", "she", "his", "hers"])
        assert list(ac.count("ushers")) == [1, 1, 0, 1]

    def test_self_overlapping(self):
        assert list(AhoCorasick(["aa"]).count("aaaa")) == [3]
        assert list(AhoCorasick(["a a"]).count("a a a")) == [2]

    def test_case_insensitive_and_unicode(self):
        ac = AhoCorasick(["Tablé"])
        assert list(ac.count("TABLÉ tablé")) == [2]

    def test_fuzz_vs_position_scan(self):
        rng = random.Random(11)
        alph = "abc"
        for _ in range(200):
            pats = list(
                {"".join(rng.choices(alph, k=rng.randint(1, 4)))
                 for _ in range(rng.randint(1, 6))}
            )
            text = "".join(rng.choices(alph + " ", k=rng.randint(0, 50)))
            assert list(AhoCorasick(pats).count(text)) == brute(pats, text), (
                pats, text)


class TestBlocklistTags:
    def test_pipeline_matches_brute(self):
        pats = ["table", "able", "a a", "slow query"]
        texts = [
            "a a a table is stable",
            "slow query on the table",
            "",
            "nothing relevant here",
        ]
        ds = ray.data.from_items(
            [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
        )
        got = blocklist_tags(ds, pats).to_pandas().sort_values("doc_id")
        for _, r in got.iterrows():
            c = brute(pats, texts[int(r["doc_id"])])
            assert int(r["n_matches"]) == sum(c)
            assert int(r["n_distinct"]) == sum(1 for x in c if x > 0)
        # doc 0: 'a a' x2 ('a a a'); 'table' x2 ('table' AND inside
        # 'sTABLE'); 'able' x2 ('tABLE' + 'stABLE'); n_distinct = 3
        r0 = got[got["doc_id"] == 0].iloc[0]
        assert int(r0["n_matches"]) == 6
        assert int(r0["n_distinct"]) == 3


class TestGroupZscore:
    def test_matches_loop_reference(self):
        import statistics

        from docstrange_ray.ops.rankstats import group_zscore

        rows = [
            {"doc_id": i, "source": f"s{i % 3}", "n_chars": (i * 7) % 50}
            for i in range(60)
        ]
        # one constant group: sigma == 0 -> z = 0
        rows += [{"doc_id": 100 + i, "source": "const", "n_chars": 5}
                 for i in range(4)]
        ds = ray.data.from_items(rows)
        got = group_zscore(ds).to_pandas().sort_values("doc_id")
        by_src = {}
        for r in rows:
            by_src.setdefault(r["source"], []).append(r["n_chars"])
        for _, r in got.iterrows():
            vals = by_src[r["source"]]
            mu = sum(vals) / len(vals)
            sig = statistics.pstdev(vals)
            exp = 0.0 if sig == 0 else (r["n_chars"] - mu) / sig
            exp = round(exp + 0.0, 6) if exp >= 0 else -round(-exp, 6)
            assert abs(r["z"] - exp) < 2e-6, (r["doc_id"], r["z"], exp)
        assert (got[got["source"] == "const"]["z"] == 0.0).all()


class TestJsonlIngest:
    def test_gzip_roundtrip_lossless(self, tmp_path):
        import pandas as pd

        from docstrange_ray.io import read_jsonl_docs, write_jsonl_docs

        rows = [
            {"doc_id": 0, "text": 'uni "quoted" \\ backslash\ttab', "n": 1},
            {"doc_id": 1, "text": "café 中文 🎈 newline\nin text", "n": -7},
            {"doc_id": 2, "text": "", "n": 0},
        ]
        ds = ray.data.from_items(rows)
        out = str(tmp_path / "shards")
        write_jsonl_docs(ds, out, compression="gzip")
        back = read_jsonl_docs(out, compression="gzip").to_pandas()
        back = back.sort_values("doc_id").reset_index(drop=True)
        orig = pd.DataFrame(rows)
        pd.testing.assert_frame_equal(orig, back[orig.columns])

    def test_column_prune(self, tmp_path):
        from docstrange_ray.io import read_jsonl_docs, write_jsonl_docs

        ds = ray.data.from_items(
            [{"doc_id": i, "text": "t", "extra": i * 2} for i in range(5)]
        )
        out = str(tmp_path / "shards")
        write_jsonl_docs(ds, out)
        back = read_jsonl_docs(out, columns=["doc_id", "text"]).to_pandas()
        assert sorted(back.columns) == ["doc_id", "text"]
        assert len(back) == 5


class TestCompressionStats:
    def test_matches_zlib_and_orders_repetitiveness(self):
        import zlib

        from docstrange_ray.ops import textstats

        texts = {
            0: "spam " * 200,                       # highly repetitive
            1: "the quick brown fox jumps over the lazy dog and then "
               "discusses philosophy with a passing badger at length",
            2: "".join(chr(33 + (i * 7919) % 90) for i in range(500)),  # noisy
            3: "",
        }
        ds = ray.data.from_items(
            [{"doc_id": k, "text": v} for k, v in texts.items()]
        )
        got = textstats.compression_stats(ds).to_pandas().set_index("doc_id")
        for k, t in texts.items():
            b = t.encode()
            assert int(got.loc[k, "raw_bytes"]) == len(b)
            assert int(got.loc[k, "gz_bytes"]) == len(zlib.compress(b, 6))
        # the detector property: repetitive text compresses far below
        # everything else (short prose pays zlib's fixed overhead, so
        # absolute ratios are length-dependent — only the repetitive
        # floor is the signal)
        assert got.loc[0, "ratio"] < 0.1
        assert got.loc[0, "ratio"] < got.loc[2, "ratio"]
        assert got.loc[0, "ratio"] < got.loc[1, "ratio"]


class TestCsvIngest:
    def test_adversarial_content_roundtrip(self, ray_session, tmp_path):
        import pandas as pd
        import pyarrow as pa
        import ray.data

        from docstrange_ray.io import read_csv_docs, write_csv_docs

        df = pd.DataFrame(
            {
                "doc_id": pd.Series([1, 2, 3, 4], dtype="int64"),
                "text": [
                    'comma, "quoted", more',
                    "unié中文",
                    "trailing space ",
                    "semi;colon\ttab",
                ],
                "n": pd.Series([10, 20, 30, 40], dtype="int64"),
            }
        )
        out = str(tmp_path / "csv_shards")
        write_csv_docs(
            ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(2), out
        )
        back = (
            read_csv_docs(out)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(back, df)
