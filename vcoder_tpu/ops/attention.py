"""Attention entry points.

One public function, :func:`multi_head_attention`, dispatches between:

* ``xla``    — plain jnp reference path (works on any backend; used for CPU
               tests and as the numerical oracle for the kernels).
* ``pallas`` — fused flash-attention TPU kernel (ops/flash_attention.py),
               the production path replacing the reference's CUDA flash-attn
               dependency (reference: vcoder_llava/train/
               llama_flash_attn_monkey_patch.py:79-91).

Layout convention throughout the framework: ``[batch, seq, heads, head_dim]``
(BTHD). Grouped-query attention is supported by passing fewer KV heads.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # large-but-finite; avoids NaNs from (-inf) - (-inf)


def _backend() -> str:
    return jax.default_backend()


def repeat_kv(x: jnp.ndarray, n_rep: int) -> jnp.ndarray:
    """[B, S, KH, D] -> [B, S, KH*n_rep, D] by head repetition (GQA)."""
    if n_rep == 1:
        return x
    b, s, kh, d = x.shape
    x = jnp.broadcast_to(x[:, :, :, None, :], (b, s, kh, n_rep, d))
    return x.reshape(b, s, kh * n_rep, d)


def xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool,
    q_positions: Optional[jnp.ndarray] = None,
    kv_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    k_scale: Optional[jnp.ndarray] = None,
    v_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Reference attention in pure jnp.

    Args:
      q: [B, T, H, D]
      k, v: [B, S, KH, D] with H % KH == 0
      causal: apply causal masking; query at position p attends keys <= p.
      q_positions: [B, T] absolute positions of the queries (needed when
        attending a KV cache where T != S). Defaults to arange(T) offset so
        that the last query aligns with the last key.
      kv_mask: [B, S] validity of each key/value slot.
      k_scale/v_scale: [B, S, KH] per-token-vector dequantization scales
        for int8 k/v. Folded into the math — ``q.(k*s) == (q.k)*s`` on
        the logits and ``p.(v*s) == (p*s).v`` on the probs — so the int8
        cache never materializes a dequantized bf16 copy (at 7B/B=8/
        S=2048 that copy costs ~21 ms/step of pure HBM traffic).
    Returns: [B, T, H, D]
    """
    b, t, h, d = q.shape
    s = k.shape[1]
    kh = k.shape[2]
    if scale is None:
        scale = d**-0.5

    compute_dtype = q.dtype
    k = repeat_kv(k.astype(compute_dtype), h // kh)
    v = repeat_kv(v.astype(compute_dtype), h // kh)

    # [B, H, T, S] logits with f32 accumulation.
    logits = jnp.einsum(
        "bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    if k_scale is not None:
        # [B, S, KH] -> [B, H, 1, S]
        logits = logits * repeat_kv(
            k_scale[..., None], h // kh
        )[..., 0].transpose(0, 2, 1)[:, :, None, :]

    mask = jnp.ones((b, t, s), dtype=bool)
    if causal:
        if q_positions is None:
            q_pos = jnp.arange(t)[None, :] + (s - t)
            q_pos = jnp.broadcast_to(q_pos, (b, t))
        else:
            q_pos = q_positions
        k_pos = jnp.arange(s)[None, :]
        mask = mask & (k_pos[:, None, :] <= q_pos[:, :, None])
    if kv_mask is not None:
        mask = mask & kv_mask[:, None, :].astype(bool)

    logits = jnp.where(mask[:, None, :, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    if v_scale is not None:
        probs = probs * repeat_kv(
            v_scale[..., None], h // kh
        )[..., 0].transpose(0, 2, 1)[:, :, None, :]
    out = jnp.einsum(
        "bhts,bshd->bthd", probs.astype(v.dtype), v
    )
    return out.astype(q.dtype)


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool,
    q_positions: Optional[jnp.ndarray] = None,
    kv_mask: Optional[jnp.ndarray] = None,
    impl: str = "auto",
    k_scale: Optional[jnp.ndarray] = None,
    v_scale: Optional[jnp.ndarray] = None,
    bounded_positions: bool = False,
) -> jnp.ndarray:
    """Dispatching attention. See :func:`xla_attention` for semantics.
    ``k_scale``/``v_scale`` (int8-KV folding) force the XLA path.
    ``bounded_positions`` asserts q_positions[b, t] <= (S - T) + t (the
    right-padded arange contract) so the causal flash route can use its
    triangular pair grid; ignored by the XLA path."""
    if k_scale is not None or v_scale is not None:
        return xla_attention(
            q, k, v, causal=causal, q_positions=q_positions,
            kv_mask=kv_mask, k_scale=k_scale, v_scale=v_scale,
        )
    if impl == "auto":
        impl = "pallas" if _backend() == "tpu" else "xla"
    if impl == "pallas" and q.shape[1] <= 16:
        # Decode steps (T=1) and speculative verify windows (T<=16): the
        # fused-softmax XLA path beats the flash kernel, which pads tiny
        # query blocks up to its q-block size (measured +3.7 ms/step for
        # a 7B T=8 verify). Decode cost is weight-streaming dominated
        # anyway at the reference's 2048+1728-token scale.
        impl = "xla"
    if impl == "pallas" and not causal and q.shape[-1] < 128:
        # Bidirectional small-head-dim attention (the CLIP tower: T=577,
        # D=64): XLA's fused softmax-attention is ~2.7x faster than the
        # flash kernel here (measured on v5e), and attention is <10% of
        # ViT FLOPs anyway. The flash kernel wins on long causal decoder
        # prefill (2.1x at T=2048, D=128).
        impl = "xla"
    if impl == "pallas":
        from vcoder_tpu.ops.flash_attention import flash_attention
        from vcoder_tpu.parallel.mesh import current_mesh

        mesh = current_mesh()
        if mesh is not None and mesh.size > 1:
            # Pallas calls are opaque to the SPMD partitioner: under a
            # multi-device mesh the kernel must be shard_map'ped (batch
            # over data+fsdp, heads over model) or XLA would replicate it.
            out = sharded_flash_attention(
                q, k, v, mesh, causal=causal, q_positions=q_positions,
                kv_mask=kv_mask, bounded_positions=bounded_positions,
            )
            if out is not None:
                return out
            impl = "xla"  # indivisible shapes: let GSPMD partition
        else:
            return flash_attention(
                q, k, v, causal=causal, q_positions=q_positions,
                kv_mask=kv_mask, bounded_positions=bounded_positions,
            )
    if impl == "xla":
        return xla_attention(
            q, k, v, causal=causal, q_positions=q_positions, kv_mask=kv_mask
        )
    raise ValueError(f"Unknown attention impl: {impl}")


def sharded_flash_attention(
    q, k, v, mesh, *, causal, q_positions=None, kv_mask=None,
    interpret: bool = False, bounded_positions: bool = False,
):
    """shard_map the flash kernel over a (data, fsdp, model) mesh: batch
    splits across data+fsdp, heads across model — attention is embarrass-
    ingly parallel over both, so no collectives are needed inside.

    Returns None when shapes don't divide the mesh — or when the mesh
    doesn't carry the (data, fsdp, model) axes at all (a user-built mesh
    with other axis names falls back to GSPMD auto-partitioning instead
    of a KeyError)."""
    from jax.sharding import PartitionSpec as P

    from vcoder_tpu.ops.flash_attention import flash_attention

    b, t, h, d = q.shape
    s, kh = k.shape[1], k.shape[2]
    if any(ax not in mesh.shape for ax in ("data", "fsdp", "model")):
        return None
    n_batch = mesh.shape["data"] * mesh.shape["fsdp"]
    n_model = mesh.shape["model"]
    if b % n_batch or h % n_model or kh % n_model:
        return None

    if q_positions is None:
        q_positions = jnp.broadcast_to(
            jnp.arange(t, dtype=jnp.int32)[None, :] + (s - t), (b, t)
        )
    if kv_mask is None:
        kv_mask = jnp.ones((b, s), dtype=jnp.int32)

    bhd = P(("data", "fsdp"), None, "model", None)
    bs = P(("data", "fsdp"), None)

    def local(q, k, v, qp, km):
        # Sharding splits batch/heads only — T/S (and the positions
        # bound) are untouched per shard.
        return flash_attention(
            q, k, v, causal=causal, q_positions=qp, kv_mask=km,
            interpret=interpret, bounded_positions=bounded_positions,
        )

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(bhd, bhd, bhd, bs, bs),
        out_specs=bhd,
        # pallas_call out_shapes carry no varying-mesh-axis metadata
        check_vma=False,
    )(q, k, v, q_positions, kv_mask)
