#!/usr/bin/env python3
"""Python half of the pandas-footer round-trip (PandasMetaSpec writes
the dirs): pd.read_parquet on a GFrame.toParquet directory must
auto-recover the index from the `_common_metadata` pandas key, with no
hints — the reference's behavior (core/io.py:56-68).

Usage: run after `sbt "testOnly graft.PandasMetaSpec"`:
  python3 tools/check_pandas_meta.py
"""
import sys

import pandas as pd

df = pd.read_parquet("/root/repo/target/tmp/pandas_meta_rt")
assert df.index.name == "id", f"index not recovered: {df.index.name!r}"
assert sorted(df.index.tolist()) == [1, 2], df.index.tolist()
assert list(df.columns) == ["s", "v"], list(df.columns)

df2 = pd.read_parquet("/root/repo/target/tmp/pandas_meta_noidx")
assert df2.index.name is None, f"phantom index: {df2.index.name!r}"
assert list(df2.columns) == ["a", "b"], list(df2.columns)

print("pandas footer round-trip OK: index auto-recovered, no-index preserved")
