"""Table profiler (ops/profile.py): one-scan exactness vs pandas,
null accounting, string-length and timestamp semantics, all-null edge."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from docstrange_ray.ops.profile import profile_table


class TestProfile:
    def test_mixed_types_exact(self, ray_session):
        tbl = pa.table(
            {
                "i": pa.array([3, None, -7, 100, 5], pa.int64()),
                "f": pa.array([1.5, 2.5, None, None, -0.25], pa.float64()),
                "s": pa.array(["ab", "", None, "xyzzy", "q"], pa.string()),
                "t": pa.array(
                    pd.to_datetime(
                        ["2024-01-01", "2024-06-01", None, "2023-12-31", "2024-01-02"]
                    ),
                    pa.timestamp("us"),
                ),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(3)
        got = profile_table(ds).to_pandas().set_index("column")
        assert (got["n"] == 5).all()
        assert got.loc["i", "n_null"] == 1 and got.loc["i", "vmin"] == -7.0
        assert got.loc["f", "n_null"] == 2 and got.loc["f", "vmax"] == 2.5
        # strings profile by length (code points)
        assert got.loc["s", "vmin"] == 0.0 and got.loc["s", "vmax"] == 5.0
        # timestamps profile by epoch microseconds
        exp_min = pd.Timestamp("2023-12-31").value // 1000
        assert got.loc["t", "vmin"] == float(exp_min)

    def test_all_null_column(self, ray_session):
        tbl = pa.table({"x": pa.array([None, None], pa.float64())})
        got = profile_table(ray.data.from_arrow(tbl)).to_pandas()
        assert got.loc[0, "n_null"] == 2
        assert np.isnan(got.loc[0, "vmin"])

    def test_column_subset(self, ray_session):
        tbl = pa.table({"a": [1, 2], "b": [3, 4]})
        got = profile_table(ray.data.from_arrow(tbl), columns=["b"]).to_pandas()
        assert list(got["column"]) == ["b"]

    def test_unorderable_and_date_columns(self, ray_session):
        import datetime

        tbl = pa.table(
            {
                "d": pa.array(
                    [datetime.date(2024, 1, 2), datetime.date(2023, 5, 1)],
                    pa.date32(),
                ),
                "b": pa.array([b"xy", b"abcd"], pa.binary()),
                "l": pa.array([[1, 2], [3]], pa.list_(pa.int64())),
            }
        )
        got = profile_table(ray.data.from_arrow(tbl)).to_pandas().set_index("column")
        assert got.loc["d", "vmin"] == float(
            (datetime.date(2023, 5, 1) - datetime.date(1970, 1, 1)).days
        )
        assert got.loc["b", "vmin"] == 2.0 and got.loc["b", "vmax"] == 4.0
        # nested types: counts only, no task crash
        assert got.loc["l", "n"] == 2 and np.isnan(got.loc["l", "vmin"])
