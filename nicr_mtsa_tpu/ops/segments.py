"""Fixed-shape segment-table utilities for on-device panoptic metrics.

The reference's PQ implementation builds python dicts of segment areas
and intersection areas per image and parallelizes the loops with a
spawn multiprocessing pool (metric/pq.py:30-296). Here the unbounded
panoptic-id space is compressed per image into a bounded sorted
segment table; pixel ids map to table slots by comparison against the
table, and the (S_gt x S_pred) intersection-area matrix is a one-hot
matmul that runs on the MXU. Everything is static-shape and
vmap/jit-friendly -- no sort-free path is needed on the prediction
side if the table is precomputed host-side (preprocessing stores
`panoptic_segment_table` for GT).
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


SEGMENT_TABLE_PAD = 2 ** 31 - 1    # keeps tables sorted ascending
# numpy scalar, NOT jnp: a module-level jnp constant would initialize
# the XLA backend at import time, breaking jax.distributed.initialize
# (which must run before any backend use in multi-host entrypoints)
_PAD = np.int32(SEGMENT_TABLE_PAD)


@partial(jax.jit, static_argnames=('size',))
def unique_table(ids: jnp.ndarray, size: int) -> jnp.ndarray:
    """(..., P) int -> (..., size) sorted unique values, padded at the
    END with SEGMENT_TABLE_PAD (int32 max) so the table STAYS sorted
    (required by `ids_to_slots`' searchsorted).

    Batched (vmap-free) replacement for jnp.unique(size=...): two
    sorts -- mark first occurrences in the sorted stream, push
    duplicates to the pad value, re-sort, truncate."""
    flat = ids.reshape(*ids.shape[:-1], -1).astype(jnp.int32)
    s = jnp.sort(flat, axis=-1)
    first = jnp.concatenate(
        [jnp.ones((*s.shape[:-1], 1), dtype=bool),
         s[..., 1:] != s[..., :-1]], axis=-1)
    dedup = jnp.where(first, s, _PAD)
    return jnp.sort(dedup, axis=-1)[..., :size]


@partial(jax.jit, static_argnames=('n_classes_with_void', 'top_k',
                                   'max_instances_per_category', 'size',
                                   'check_contract'))
def merged_segment_table(
    panoptic_map: jnp.ndarray,     # (B, ...) ids = class * M + rank
    n_classes_with_void: int,
    top_k: int,
    max_instances_per_category: int,
    size: int,
    check_contract: bool = False,
) -> jnp.ndarray:
    """`unique_table` specialized to panoptic maps produced by
    `ops.merge.deeplab_merge` (or nearest-resizes of them), whose ids
    are class * M + rank with rank <= top_k: presence is a (C, K+1)
    one-hot histogram on the MXU plus a sort of the C*(K+1) candidate
    grid -- no O(P log P) sort of the pixel map (2 x ~13 ms per call
    at (32, 512*512) in the fused eval step).

    Any id OUTSIDE the class*M+rank contract (rank > top_k or
    class >= C) has no candidate slot: its one-hots are all-zero and
    the segment silently vanishes from the table. Maps not produced by
    the merge (or a future rank-assignment change) must therefore pass
    `check_contract=True` -- wrap the caller with
    `utils.debug.checkify_invariants` to surface the violation as a
    host error -- or use the general `unique_table` instead."""
    B = panoptic_map.shape[0]
    C, K, M = n_classes_with_void, top_k, max_instances_per_category
    i32 = panoptic_map.astype(jnp.int32)    # (B, ...): stays unflattened
    cls = i32 // M
    rank = i32 - cls * M                        # <= K for merged maps
    if check_contract:
        from jax.experimental import checkify
        checkify.check(
            jnp.all((rank <= K) & (cls >= 0) & (cls < C)),
            'merged_segment_table: panoptic id outside the '
            'class*M+rank contract (max rank {r}, max class {c})',
            r=jnp.max(rank), c=jnp.max(cls))
    oh_c = jax.nn.one_hot(cls, C, dtype=jnp.bfloat16)
    oh_r = jax.nn.one_hot(rank, K + 1, dtype=jnp.bfloat16)
    px = tuple(range(1, i32.ndim))
    counts = jax.lax.dot_general(
        oh_c, oh_r, ((px, px), ((0,), (0,))),
        preferred_element_type=jnp.float32)     # (B, C, K+1)
    ids = (jnp.arange(C, dtype=jnp.int32)[:, None] * M
           + jnp.arange(K + 1, dtype=jnp.int32)[None, :])
    cand = jnp.where(counts > 0, ids[None], _PAD).reshape(B, C * (K + 1))
    return jnp.sort(cand, axis=-1)[..., :size]


def ids_to_slots(ids: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """Map pixel ids (B, ...) to slots in a sorted unique table (B, S);
    ids not in the table (incl. -1 padding) map to S. The pixel axes
    may stay multi-dimensional ((B, H, W) maps go in unflattened: a
    (B, P) reshape of a batch-minor map costs a ~13 ms linearization
    copy at the B128 eval shape, while every op here is elementwise
    or a dot_general that contracts only the bucket axis).

    Formulated as compare-counts, NOT searchsorted: jnp.searchsorted
    lowers to a per-element binary-search while loop on TPU (measured
    90-150 ms per call at (8, 307200)x128 inside the fused eval step
    -- ~95%% of the whole step). The count of table entries < id IS
    the searchsorted('left') slot, and for a sorted unique table it
    equals the match index when the id is present.

    For tables larger than one bucket the compare-count runs in TWO
    levels (a vectorized 16-ary search): level 1 counts bucket FIRST
    entries <= id over the S/16 bucket boundaries; the bucket's 16
    entries are then fetched per pixel with a one-hot MXU matmul (no
    big-index gather -- PERF.md lesson 1) and level 2 counts within
    the bucket. Entries before the bucket are all < id (sorted unique
    table), so slot = bucket*16 + within, exactly the flat
    compare-count; equality can only occur inside the bucket, so
    membership needs only the 16 fetched entries. This cuts the
    per-pixel compare work from 2*S to ~2*(S/16 + 16) + a small
    matmul: the flat form's four (B, P, S) compare/convert reduce
    fusions were ~92 ms of the B128 fused eval step (S=256/128 at
    P=512*512); the bucketed form measures ~22 ms.

    Table values are compared in f32 (exact: real ids < 2^24; the
    SEGMENT_TABLE_PAD sentinel rounds to 2^31, still larger than any
    id and never equal to one)."""
    S = table.shape[-1]
    i32 = ids.astype(jnp.int32)
    B = table.shape[0]
    n_px = i32.ndim - 1                            # pixel axes count
    if S <= 32 or S % 16 != 0:
        t = table.reshape(B, *(1,) * n_px, S)
        i = i32[..., None]                         # (B, ..., 1)
        slot = jnp.sum(t < i, axis=-1).astype(jnp.int32)
        found = jnp.any(t == i, axis=-1)
        return jnp.where(found, slot, S)

    BUCKET = 16
    nb = S // BUCKET
    idf = i32.astype(jnp.float32)[..., None]       # (B, ..., 1)
    bounds = table[:, ::BUCKET].astype(jnp.float32)  # (B, nb)
    bucket = jnp.sum(bounds.reshape(B, *(1,) * n_px, nb) <= idf,
                     axis=-1) - 1
    bucket = jnp.maximum(bucket, 0).astype(jnp.int32)   # (B, ...)

    # fetch the bucket's entries: one-hot selection on the MXU. The
    # selection matmul must run at HIGHEST precision -- it routes
    # table VALUES (up to 2^31) through the product, and the default
    # one-bf16-pass matmul (TPU) / oneDNN reduced precision (CPU)
    # rounds them (e.g. 131073 -> 131072), silently breaking the
    # equality membership test (CLAUDE.md selection-matrix lesson;
    # caught by the full-system parity test's missing FN counts).
    # Count-style one-hot einsums (intersection_matrix,
    # merged_segment_table) are safe: their VALUES are 0/1.
    oh = jax.nn.one_hot(bucket, nb, dtype=jnp.float32)  # (B, ..., nb)
    tb = table.reshape(B, nb, BUCKET).astype(jnp.float32)
    fetched = jax.lax.dot_general(
        oh, tb, (((oh.ndim - 1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)       # (B, ..., BUCKET)

    within = jnp.sum(fetched < idf, axis=-1).astype(jnp.int32)
    found = jnp.any(fetched == idf, axis=-1)
    slot = bucket * BUCKET + within
    return jnp.where(found, slot, S)


def intersection_matrix(
    gt_slots: jnp.ndarray,    # (B, ...) in [0, S_gt]
    pred_slots: jnp.ndarray,  # (B, ...) in [0, S_pred]
    n_gt: int,
    n_pred: int,
) -> jnp.ndarray:
    """(B, S_gt+1, S_pred+1) float32 pixel counts per (gt, pred) segment
    pair; the last row/column holds out-of-table pixels. Exact (bf16
    0/1 one-hots, f32 accumulation, counts < 2^24). The pixel axes may
    stay multi-dimensional ((B, H, W) slot maps contract both spatial
    dims in one dot_general -- flattening them first costs a
    linearization copy of the batch-minor maps).

    A Pallas twin that builds the one-hots per pixel tile in VMEM and
    accumulates the MXU product in the output block exists
    (ops/pallas/intersection_kernel.py, hardware-exactness-tested) but
    is NOT the default: inside the fused eval program it forces
    row-major layouts on the slot maps and measures 4% SLOWER end to
    end (122.8 -> 118.2 frames/s -- PERF.md lesson 6 again); XLA
    also fuses the one-hot construction into the einsum operands, so
    the feared (B, P, S) HBM materialization does not actually bind."""
    oh_gt = jax.nn.one_hot(gt_slots, n_gt + 1, dtype=jnp.bfloat16)
    oh_pred = jax.nn.one_hot(pred_slots, n_pred + 1, dtype=jnp.bfloat16)
    px_gt = tuple(range(1, gt_slots.ndim))
    px_pred = tuple(range(1, pred_slots.ndim))
    return jax.lax.dot_general(
        oh_gt, oh_pred, ((px_gt, px_pred), ((0,), (0,))),
        preferred_element_type=jnp.float32)
