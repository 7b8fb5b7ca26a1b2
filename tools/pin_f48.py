#!/usr/bin/env python3
"""Independent oracle for f48_variant_annotation.

Parses the raw biobear VCF and gencode polyA GFF fixtures directly (no
graft code, no Spark) and computes, for every variant, the nearest chr-
matching GFF feature within a 1 Mb window: distance 0 if the position
falls inside [start, end], otherwise the gap to the closer edge; ties
broken by (start, type). Emits the VALUES block pinned into
FormatQueries.oracles("f48_variant_annotation").
"""
import gzip

FX = "/root/reference/exon/exon-core/test-data/datasources"
W = 1_000_000

variants = []  # (seqname, pos, ref)
with gzip.open(f"{FX}/biobear-vcf/vcf_file.vcf.gz", "rt") as fh:
    for line in fh:
        if line.startswith("#"):
            continue
        f = line.rstrip("\n").split("\t")
        variants.append(("chr" + f[0], int(f[1]), f[3]))

feats = {}  # seqname -> [(start, end, type)]
with gzip.open(f"{FX}/gff-index/gencode.v38.polyAs.gff.gz", "rt") as fh:
    for line in fh:
        if line.startswith("#"):
            continue
        f = line.rstrip("\n").split("\t")
        feats.setdefault(f[0], []).append((int(f[3]), int(f[4]), f[2]))

rows = []
for seq, pos, ref in variants:
    best = None
    for start, end, typ in feats.get(seq, []):
        if start > pos + W or end < pos - W:
            continue
        dist = 0 if start <= pos <= end else (start - pos if pos < start else pos - end)
        key = (dist, start, typ)
        if best is None or key < best:
            best = key
    assert best is not None, (seq, pos)
    rows.append((seq, pos, ref, best[0], best[1], best[2]))

# The fixture contains one fully duplicated variant line, so the gate
# aggregates per (seqname, pos, ref) with a multiplicity count.
agg = {}
for r in rows:
    agg[r[:3]] = (agg.get(r[:3], (0,))[0] + 1,) + r[3:]
for (seq, pos, ref), (n, dist, fstart, ftype) in sorted(agg.items(), key=lambda kv: (kv[0][1], kv[0][2])):
    print(f"  ('{seq}', CAST({pos} AS BIGINT), '{ref}', CAST({n} AS BIGINT), CAST({dist} AS BIGINT), CAST({fstart} AS BIGINT), '{ftype}'),")
