"""Corpus-size-adaptive parameters for the sketch / ANN operators.

Every sketch operator in this package has a selectivity knob that must grow
with corpus size N or its candidate join degenerates toward all-pairs:

- sign-LSH planes: a bucket self-join produces ~N^2 / 2^planes candidate
  rows per table, so planes must track log2(N). Recall is recovered by
  OR-ing independent tables, never by removing planes.
- SimHash blocks (Manku/Das/Garcia-Molina-style block banding): a pair
  within hamming distance h shares at least b-h of b signature blocks, so
  keying on every (b-h)-block combination is pigeonhole-complete. The
  effective key width is (b-h) * (sig_bits/b) bits — growing b widens the
  key (more selective buckets) at the cost of C(b, h) join branches.
- IVF centroids: classic sqrt(N) rule for balancing list length against
  number of lists; nprobe ~ sqrt(centroids) keeps recall at a few percent
  of the corpus scanned.

params_for(n_rows) centralizes those rules. At the driver-fixture scale
(n ~= 10^3) it returns exactly the constants the oracle queries pin
(pipeline_queries derives its module constants from it), so tuning the
rules can never silently drift the correctness gate.
"""

from __future__ import annotations

import math
from dataclasses import dataclass


@dataclass(frozen=True)
class PipelineParams:
    n_rows: int
    # sign-LSH (single-table top-k buckets, ann.lsh_bucket_expr)
    lsh_planes: int
    # multi-table LSH for the near-dup SELF-join (ann.near_dup_pairs):
    # candidate volume carries an N^2/2^planes term, so planes must track
    # log2(N); the 0.99-cosine dup band keeps per-plane collision >= 0.955,
    # so moderate table counts hold recall
    neardup_planes: int
    neardup_tables: int
    # multi-table LSH for ANN TOP-K (ann.lsh_topk_multi): the target
    # similarity is the k-th neighbor (~0.9 cosine), well below the dup
    # band, so per-plane collision is lower (~0.89) and recall must come
    # from MORE tables at FEWER planes per table. That trade is cheap here:
    # the candidate join is queries x corpus (n_q * N * T / 2^planes rows),
    # not the self-join's N^2 — a table costs one extra signature column,
    # not a quadratic term
    ann_planes: int
    ann_tables: int
    # SimHash block banding (dedup.simhash_near_dup_pairs)
    simhash_bits: int
    simhash_blocks: int
    simhash_key_bits: int  # (blocks - max_hamming) * floor(bits / blocks)
    # IVF (ann.ivf_topk)
    ivf_centroids: int
    ivf_nprobe: int
    # PQ (ann.pq_adc_topk): m subspaces, codes per sub-codebook
    pq_m: int
    pq_codes: int
    # MinHash banding (dedup.minhash_signatures / lsh_candidate_pairs)
    minhash_k: int
    band_rows: int


def _clamp(v: int, lo: int, hi: int) -> int:
    return max(lo, min(hi, v))


def simhash_blocks_for(n_rows: int, max_hamming: int = 3, sig_bits: int = 60) -> int:
    """Smallest block count b > max_hamming whose (b-h)-block key reaches
    ~log2(N)+5 bits (expected bucket size << 1 per key), capped so every
    block keeps >= 4 bits. At n~10^3 this is b = h+1 = 4 — the plain
    one-block-per-band scheme the fixture oracles pin."""
    want = min(int(math.ceil(math.log2(max(n_rows, 2)))) + 5, (3 * sig_bits) // 4)
    b = max_hamming + 1
    while (b - max_hamming) * (sig_bits // b) < want and sig_bits // (b + 1) >= 4:
        b += 1
    return b


def params_for(n_rows: int, max_hamming: int = 3) -> PipelineParams:
    n = max(int(n_rows), 2)
    lg = math.log2(n)
    sig_bits = 60
    blocks = simhash_blocks_for(n, max_hamming, sig_bits)
    centroids = _clamp(1 << round(math.log2(max(math.sqrt(n) / 2.0, 2.0))), 16, 65536)
    # Multi-table LSH: planes track log2(N) so per-table bucket occupancy
    # stays O(1); tables GROW with planes to hold recall (per-plane
    # collision p >= 0.955 for cosine >= 0.99 near-dups, so per-table
    # recall p^planes shrinks as planes rise — e.g. 27 planes / 8 tables:
    # 1 - (1 - 0.955^27)^8 ~= 0.93). Growing only planes (the old rule)
    # silently traded recall for selectivity past the cap.
    nd_planes = _clamp(int(math.floor(lg)) - 2, 8, 28)
    nd_tables = _clamp(4 + (nd_planes - 8) // 4, 4, 12)
    # ANN top-k tables: planes ~ log2(N)-4 (16x the per-table bucket
    # occupancy of the near-dup rule — affordable in a queries x corpus
    # join), tables grow 3:2 with planes so recall at the ~0.9-cosine
    # neighbor band stays >= 0.8: at 1e5 that is 12 planes x 10 tables ->
    # measured recall@10 0.852 (the old shared 14x5 rule predicted 0.66
    # and measured 0.654)
    an_planes = _clamp(int(math.floor(lg)) - 4, 8, 20)
    # 3:2 table growth per plane: the 1:1 rule measured recall@10 = 0.796
    # at 1e5 (the 10th neighbor sits nearer 0.92 cosine than the 0.94
    # cluster mean, so per-table recall is lower than the mean predicts)
    an_tables = _clamp(4 + ((an_planes - 8) * 3) // 2, 4, 16)
    # MinHash banding: to SHARPEN the candidate threshold curve with N,
    # band rows r and band count b must grow TOGETHER — threshold
    # (1/b)^(1/r) stays ~0.71 while a dissimilar pair's per-band collision
    # s^r shrinks geometrically. Adding bands at fixed r=2 (the old rule)
    # LOWERS the threshold, i.e. MORE false candidates at scale.
    if n < 10**6:
        mk, br = 4, 2  # 2 bands x 2 rows, threshold (1/2)^(1/2) ~= .707
    elif n < 10**12:
        mk, br = 16, 4  # 4 bands x 4 rows, threshold (1/4)^(1/4) ~= .707
    else:
        mk, br = 36, 6  # 6 bands x 6 rows, threshold (1/6)^(1/6) ~= .742
    return PipelineParams(
        n_rows=n,
        # ~N per-table bucket occupancy of 1: planes ~= log2(N); 16 floor
        # keeps fixture behavior, 28 cap bounds plan size (add tables past it)
        lsh_planes=_clamp(int(math.ceil(lg)), 16, 28),
        neardup_planes=nd_planes,
        neardup_tables=nd_tables,
        ann_planes=an_planes,
        ann_tables=an_tables,
        simhash_bits=sig_bits,
        simhash_blocks=blocks,
        simhash_key_bits=(blocks - max_hamming) * (sig_bits // blocks),
        ivf_centroids=centroids,
        ivf_nprobe=max(2, round(math.sqrt(centroids) / 2.0)),
        # PQ codes: 16 (4-bit) keeps the fixture SQL oracle tractable; the
        # classic at-scale setting is 256 (8-bit, Jegou et al.) — code width
        # is a quantization-error knob, independent of N beyond that step
        pq_m=8,
        pq_codes=16 if n < 10**6 else 256,
        minhash_k=mk,
        band_rows=br,
    )
