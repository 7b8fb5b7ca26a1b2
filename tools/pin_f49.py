#!/usr/bin/env python3
"""Independent oracle for f49_bam_depth.

Parses the binary BAM fixture directly (BGZF = concatenated gzip members,
which Python's gzip handles natively; record layout per SAM spec §4.2 —
no graft code, no Spark, no htslib) and computes the per-reference
coverage profile by an exact sweep line over [start, end] read spans
(1-based inclusive, end from CIGAR reference consumption):
covered_bases (depth >= 1), max_depth, sum_depth (= sum of span
lengths), n_reads. Emits the VALUES block pinned into
FormatQueries.oracles("f49_bam_depth").
"""
import gzip
import struct
import sys
from collections import defaultdict

PATH = "/root/reference/exon/exon-core/test-data/datasources/bam/test.bam"
REF_CONSUMING = {0, 2, 3, 7, 8}  # M D N = X

data = gzip.open(PATH, "rb").read()
assert data[:4] == b"BAM\x01"
off = 4
(l_text,) = struct.unpack_from("<i", data, off); off += 4 + l_text
(n_ref,) = struct.unpack_from("<i", data, off); off += 4
names = []
for _ in range(n_ref):
    (l_name,) = struct.unpack_from("<i", data, off); off += 4
    names.append(data[off:off + l_name - 1].decode()); off += l_name
    off += 4  # l_ref

spans = defaultdict(list)
while off < len(data):
    (block_size,) = struct.unpack_from("<i", data, off); off += 4
    rec = data[off:off + block_size]; off += block_size
    ref_id, pos = struct.unpack_from("<ii", rec, 0)
    l_read_name = rec[8]
    n_cigar_op, flag = struct.unpack_from("<HH", rec, 12)
    if ref_id < 0 or flag & 0x4:
        continue
    co = 32 + l_read_name
    reflen = 0
    for k in range(n_cigar_op):
        (c,) = struct.unpack_from("<I", rec, co + 4 * k)
        if (c & 0xF) in REF_CONSUMING:
            reflen += c >> 4
    start = pos + 1
    end = start + reflen - 1
    if end >= start:
        spans[names[ref_id]].append((start, end))

rows = []
for ref in sorted(spans):
    deltas = defaultdict(int)
    for s, e in spans[ref]:
        deltas[s] += 1
        deltas[e + 1] -= 1
    pts = sorted(deltas)
    depth = covered = sum_depth = max_depth = 0
    for p, nxt in zip(pts, pts[1:] + [None]):
        depth += deltas[p]
        if nxt is not None:
            seg = nxt - p
            if depth > 0:
                covered += seg
            sum_depth += depth * seg
            max_depth = max(max_depth, depth)
    rows.append((ref, len(spans[ref]), covered, max_depth, sum_depth))

for r in rows:
    print(f"  ('{r[0]}', CAST({r[1]} AS BIGINT), CAST({r[2]} AS BIGINT), CAST({r[3]} AS BIGINT), CAST({r[4]} AS BIGINT)),")
print(f"-- refs with mapped reads: {len(rows)}", file=sys.stderr)
