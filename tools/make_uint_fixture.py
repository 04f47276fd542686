#!/usr/bin/env python3
"""Write fixtures/uint.parquet: deterministic unsigned-int columns with
native parquet UINT_8/16/32/64 annotations (pyarrow), covering zero,
max, and mid-range values.  Committed to the repo; regenerate with:
    python3 tools/make_uint_fixture.py
"""
import pyarrow as pa
import pyarrow.parquet as pq

N = 1000
ids = list(range(N))
# deterministic mixes hitting boundaries: 0, max, and an LCG spread
u8  = [(i * 97 + 13) % 256 for i in ids];  u8[0] = 0;  u8[1] = 255
u16 = [(i * 40503 + 7) % 65536 for i in ids]; u16[0] = 0; u16[1] = 65535
u32 = [(i * 2654435761 + 101) % (2**32) for i in ids]; u32[0] = 0; u32[1] = 2**32 - 1
u64 = [(i * 0x9E3779B97F4A7C15 + 3) % (2**64) for i in ids]; u64[0] = 0; u64[1] = 2**64 - 1
# a couple of signed companions for cross-dtype promotion
i16 = [((i * 31 + 5) % 65536) - 32768 for i in ids]
i64 = [i * 1_000_003 - 500_000_000 for i in ids]
t = pa.table({
    "id": pa.array(ids, pa.int64()),
    "u8": pa.array(u8, pa.uint8()),
    "u16": pa.array(u16, pa.uint16()),
    "u32": pa.array(u32, pa.uint32()),
    "u64": pa.array(u64, pa.uint64()),
    "i16": pa.array(i16, pa.int16()),
    "i64": pa.array(i64, pa.int64()),
})
pq.write_table(t, "fixtures/uint.parquet", compression="snappy")
print(pq.read_schema("fixtures/uint.parquet"))
