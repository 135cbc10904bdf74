"""On-device NMS: exact greedy NMS, padded top-k selection, and soft-NMS.

The reference runs NMS on host (CPU: lib/nms/cpu_nms.pyx, lib/nms/nms.py:45-141) or on
GPU with a bitmask-tile CUDA kernel plus a host-side greedy sweep
(lib/nms/nms_kernel.cu:34-78, gpu_nms.pyx:17-31). Both require a device->host round
trip per call (operator_py/proposal.py:52, core/tester.py:230-268).

Here greedy NMS is a fully on-device, static-shape computation with *exact* greedy
semantics, built for the TPU memory system:

  1. Sort boxes by score (descending).
  2. Process in blocks of B boxes. For each block:
     a. cross-suppress against the already-decided prefix with one batched IoU
        computation (a [B, prefix] matrix op — rides the VPU/MXU),
     b. resolve the remaining intra-block suppression with a fixpoint iteration of
        the triangular recurrence  active_j = ~any_{i<j}(active_i & iou_ij > t),
        which converges to the greedy solution in at most chain-depth steps.

Total work is one N x N IoU evaluation (touched once, block row by block row) — the
same algorithmic shape as the reference's CUDA bitmask kernel, but with the greedy
sweep also on device and no dynamic shapes anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from relation_tpu.ops.boxes import bbox_overlaps

_NEG_INF = -1e10


def _intra_block_fixpoint(iou_gt: jnp.ndarray, seed_active: jnp.ndarray) -> jnp.ndarray:
    """Solve the triangular greedy recurrence inside one block.

    iou_gt: [B, B] bool, True where iou(i, j) > thresh.
    seed_active: [B] bool — candidates not already suppressed by the prefix.
    Returns the exact greedy keep mask for the block.
    """
    B = seed_active.shape[0]
    upper = (jnp.arange(B)[:, None] < jnp.arange(B)[None, :])  # i < j
    sup_mat = iou_gt & upper                                   # i suppresses j

    def cond(state):
        active, prev, it = state
        return (it < B) & jnp.any(active != prev)

    def body(state):
        active, _, it = state
        suppressed = jnp.any(active[:, None] & sup_mat, axis=0)
        return seed_active & ~suppressed, active, it + 1

    init = (seed_active, ~seed_active, jnp.int32(0))
    active, _, _ = jax.lax.while_loop(cond, body, init)
    return active


def _on_tpu() -> bool:
    """True when the default backend can run Mosaic (Pallas TPU) kernels."""
    try:
        return jax.default_backend() != "cpu"
    except Exception:                                          # pragma: no cover
        return False


@functools.partial(jax.jit, static_argnames=("block_size", "max_keep"))
def greedy_nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thresh,
                    valid: jnp.ndarray | None = None,
                    block_size: int = 512,
                    max_keep: int | None = None) -> jnp.ndarray:
    """Exact greedy NMS. Returns a bool keep mask in the *input* order.

    boxes: [N, 4]; scores: [N]; valid: optional [N] bool of real (non-padded) boxes.
    Semantics match the reference host NMS (lib/nms/nms.py:45-83): descending score
    order, IoU with the +1 convention, suppression strictly by earlier kept boxes.

    ``max_keep``: stop sweeping once at least this many boxes are kept — the mask
    is then exact for the top-max_keep kept boxes (all the downstream consumers,
    proposal top-N and max_per_image, use only those). This skips the low-score
    tail blocks entirely: the sweep over score-sorted blocks terminates early.

    (Production C4 proposal NMS now uses the presorted single-launch Pallas
    sweep — nms_topk_presorted, 147 us vs 437 us on real RPN outputs. This
    while_loop form remains the exact-oracle / CPU path and the FPN proposal
    path, where a Pallas consumer would break XLA's space-to-batch conv
    rewrites upstream — see CLAUDE.md "poison scope". The *batched* Pallas
    kernel wins for classwise_nms below, where vmapping this while_loop runs
    every class to the slowest class's iteration count.)
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    masked_scores = jnp.where(valid, scores, _NEG_INF)
    order = jnp.argsort(-masked_scores)                        # stable, descending
    B = min(block_size, n)
    num_blocks = -(-n // B)
    np_pad = num_blocks * B
    boxes_s = jnp.zeros((np_pad, 4), boxes.dtype).at[:n].set(boxes[order])
    valid_s = jnp.zeros((np_pad,), bool).at[:n].set(valid[order])
    col_idx = jnp.arange(np_pad)
    keep_cap = np_pad if max_keep is None else int(max_keep)

    def cond(state):
        b, keep_s, kept = state
        return (b < num_blocks) & (kept < keep_cap)

    def body(state):
        b, keep_s, kept = state
        lo = b * B
        blk = jax.lax.dynamic_slice(boxes_s, (lo, 0), (B, 4))
        blk_valid = jax.lax.dynamic_slice(valid_s, (lo,), (B,))
        iou_all = bbox_overlaps(blk, boxes_s)                  # [B, Np]
        sup_prev = jnp.any((iou_all > iou_thresh) & keep_s[None, :]
                           & (col_idx[None, :] < lo), axis=1)
        seed = blk_valid & ~sup_prev
        iou_blk = bbox_overlaps(blk, blk) > iou_thresh
        active = _intra_block_fixpoint(iou_blk, seed)
        keep_s = jax.lax.dynamic_update_slice(keep_s, active, (lo,))
        return b + 1, keep_s, kept + jnp.sum(active.astype(jnp.int32))

    init = (jnp.int32(0), jnp.zeros((np_pad,), bool), jnp.int32(0))
    _, keep_s, _ = jax.lax.while_loop(cond, body, init)

    # un-sort back to input order
    keep = jnp.zeros((n,), dtype=bool).at[order].set(keep_s[:n])
    return keep


@functools.partial(jax.jit, static_argnames=("top_k", "block_size"))
def greedy_nms_topk(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thresh,
                    top_k: int, valid: jnp.ndarray | None = None,
                    block_size: int = 512):
    """Greedy NMS, then take the top_k kept boxes in score order, padded to top_k.

    Static-shape replacement for the reference proposal op's keep-list handling
    (operator_py/proposal.py:150-158): if fewer than top_k survive, the output is
    padded by cycling through the kept boxes (the reference pads with a random choice
    among kept — deterministic cycling is used here to keep the op reproducible).

    Returns (indices [top_k] int32 into the input, pad_mask [top_k] bool where True
    means a real (non-duplicated) entry).
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    keep = greedy_nms_mask(boxes, scores, iou_thresh, valid, block_size,
                           max_keep=top_k)
    masked_scores = jnp.where(keep, scores, _NEG_INF)
    # kept boxes first, in descending score order
    order = jnp.argsort(-masked_scores)
    num_keep = jnp.sum(keep.astype(jnp.int32))
    slots = jnp.arange(top_k)
    real = slots < num_keep
    safe_mod = jnp.maximum(num_keep, 1)
    idx = jnp.where(real, slots, slots % safe_mod)
    return order[idx], real


def nms_topk_presorted(boxesT: jnp.ndarray, scores: jnp.ndarray, valid,
                       iou_thresh, top_k: int, use_kernel: bool | None = None):
    """greedy_nms_topk for inputs ALREADY in descending-score order, with boxes
    in planar [4, N] layout (never materializes a lane-padded [N, 4] array).

    This is the proposal-op fast path (operator_py/proposal.py:144-158): the
    pre-NMS candidates come straight out of lax.top_k, so the sort inside
    greedy_nms_mask is redundant, and on TPU the sweep runs as the single-launch
    Pallas kernel. On real RPN outputs the XLA while_loop tail costs ~437 us
    (data-dependent fixpoint chain depth) vs ~147 us for the kernel (measured
    v5e, 6000 boxes -> 300; tools/microbench_nms_variants.py).

    Returns (indices [top_k] into the sorted input, real [top_k] bool), padded
    by cycling through the kept boxes like greedy_nms_topk.

    ``use_kernel``: None = Pallas sweep on TPU (the flagship fast path).
    Callers whose upstream graph contains space-to-batch-eligible convs
    (big-spatial stride-4/8 levels — FPN) MUST pass False: a pallas call
    consuming conv-derived tensors forfeits those convs' s2b rewrites
    (~+5.6 ms/image measured on the FPN pyramid; see CLAUDE.md measurement
    traps), dwarfing the kernel's ~290 us advantage.
    """
    n = boxesT.shape[1]
    if use_kernel is None:
        use_kernel = True
    if use_kernel and _on_tpu():
        from relation_tpu.ops.pallas.nms_kernel import nms_keep_sorted
        T = 256 if n >= 256 else 128
        np_pad = -(-n // T) * T
        bTp = jnp.zeros((1, 4, np_pad), jnp.float32).at[0, :, :n].set(
            boxesT.astype(jnp.float32))
        vp = jnp.zeros((1, np_pad), jnp.float32).at[0, :n].set(
            valid.astype(jnp.float32))
        keep = nms_keep_sorted(bTp, vp, thresh=float(iou_thresh), block=T,
                               max_keep=int(top_k))[0, :n] > 0.5
    else:
        keep = greedy_nms_mask(boxesT.T, scores, iou_thresh, valid,
                               max_keep=top_k)
    masked = jnp.where(keep, scores, _NEG_INF)
    order = jnp.argsort(-masked)
    num_keep = jnp.sum(keep.astype(jnp.int32))
    slots = jnp.arange(top_k)
    real = slots < num_keep
    idx = jnp.where(real, slots, slots % jnp.maximum(num_keep, 1))
    return order[idx], real


def soft_nms(boxes: jnp.ndarray, scores: jnp.ndarray, sigma,
             max_dets: int, valid: jnp.ndarray | None = None,
             score_floor: float = 0.0):
    """Gaussian soft-NMS, on device, fixed max_dets iterations.

    Mirrors the reference host implementation (lib/nms/nms.py:96-141 with
    rescore(type='gaussian'): scores *= exp(-iou^2 / sigma)).  Each iteration picks
    the current max-score box, freezes its score, and decays the rest.

    boxes: [N, 4]; scores: [N]. Returns (keep_idx [max_dets], keep_scores [max_dets],
    keep_valid [max_dets] bool). Suited to vmap over classes.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    live_scores = jnp.where(valid, scores, _NEG_INF)

    def body(carry, _):
        live = carry
        i = jnp.argmax(live)
        top_score = live[i]
        iou = bbox_overlaps(boxes[i][None, :], boxes)[0]       # [N]
        decay = jnp.exp(-(iou * iou) / sigma)
        live = live * jnp.where(live > _NEG_INF / 2, decay, 1.0)
        live = live.at[i].set(_NEG_INF)                        # remove the picked box
        return live, (i, top_score)

    _, (idx, kept_scores) = jax.lax.scan(body, live_scores, None, length=max_dets)
    keep_valid = kept_scores > score_floor
    return idx, kept_scores, keep_valid


def classwise_nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thresh,
                  score_thresh, valid: jnp.ndarray | None = None,
                  max_keep: int | None = None) -> jnp.ndarray:
    """Per-class greedy NMS keep mask.

    boxes: [C, N, 4] (or [N, 4] shared across classes), scores: [C, N].
    Replaces the per-class host NMS loop of the reference evaluator
    (core/tester.py:230-268) with one vmapped on-device pass.
    """
    C, n = scores.shape
    if boxes.ndim == 2:
        boxes = jnp.broadcast_to(boxes[None], (C, n, 4))
    if valid is None:
        valid = jnp.ones((C, n), dtype=bool)
    valid = valid & (scores > score_thresh)

    if _on_tpu():
        return _classwise_nms_pallas(boxes, scores, valid, iou_thresh, max_keep)
    fn = jax.vmap(lambda b, s, v: greedy_nms_mask(b, s, iou_thresh, v,
                                                  max_keep=max_keep))
    return fn(boxes, scores, valid)


def _classwise_nms_pallas(boxes, scores, valid, iou_thresh,
                          max_keep: int | None, interpret: bool = False):
    """One batched Pallas launch (grid=C) instead of C vmapped while_loops —
    vmapping the block sweep runs every class to the slowest class's iteration
    count; independent kernel programs early-exit per class (measured 841 ->
    654 us at C=80, n=300 on v5e)."""
    from relation_tpu.ops.pallas.nms_kernel import nms_keep_sorted
    C, n = scores.shape
    masked = jnp.where(valid, scores, _NEG_INF)
    order = jnp.argsort(-masked, axis=1)                       # [C, n]
    boxes_s = jnp.take_along_axis(boxes, order[..., None], axis=1)
    valid_s = jnp.take_along_axis(valid, order, axis=1)
    T = 256 if n >= 256 else 128
    np_pad = -(-n // T) * T
    bT = jnp.zeros((C, np_pad, 4), jnp.float32).at[:, :n].set(
        boxes_s.astype(jnp.float32)).transpose(0, 2, 1)        # [C, 4, Np]
    vf = jnp.zeros((C, np_pad), jnp.float32).at[:, :n].set(
        valid_s.astype(jnp.float32))
    cap = np_pad if max_keep is None else int(max_keep)
    keep_f = nms_keep_sorted(bT, vf, thresh=float(iou_thresh), block=T,
                             max_keep=cap, interpret=interpret)
    inv = jnp.argsort(order, axis=1)
    return jnp.take_along_axis(keep_f[:, :n] > 0.5, inv, axis=1)
