"""The fixed contraction set of the MPS classifier, as einsums + scans.

The reference routes every contraction through a generic named-axis
``contract`` that physically permutes both operands and broadcast-multiplies
(``custom_linalg_tools.py:10-87``); its own profiling shows >77% of the time
goes to transposes/reshapes, not math (SURVEY.md section 6). Here each of the
~8 distinct contraction patterns of the algorithm is a fixed einsum with
static shapes so XLA tiles them onto the MXU, and the sequential
site-chain structure (the reference's ``r_cum_contraction`` /
``l_cum_contraction`` caches, ``Network_class.py:231-255``) becomes
``lax.scan`` prefix/suffix scans.

Index naming convention used throughout (einsum subscripts):
    ``n`` site index,  ``b`` batch,  ``l``/``r`` left/right bond (dim M),
    ``d`` physical/feature leg (dim D),  ``o`` output label leg (dim L).

Shapes:
    sites       (N, M, D, M)   padded uniform site stack
    label_site  (M, D, L, M)   the site carrying the label leg
    phi         (B, N, D)      embedded input
    mats        (N, B, M, M)   per-site input-contracted transfer matrices
    envs        (B, M)         left/right environment vectors
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def boundary_vector(M: int, dtype=jnp.float32) -> jnp.ndarray:
    """One-hot boundary vector ``e0`` closing the padded open chain.

    The reference gives edge sites smaller shapes (``Network_class.py:145-148``,
    first site ``[L, M, D]``, last ``[M, D]``). We instead pad every site to
    ``(M, D, M)`` and contract the chain ends with ``e0``; zero rows/columns
    of the edge sites are exactly preserved by both the gradient update and
    the SVD split, so this is numerically identical while letting one scan
    body serve all sites.
    """
    return jnp.zeros((M,), dtype=dtype).at[0].set(1.0)


def site_mats(sites: jnp.ndarray, phi: jnp.ndarray) -> jnp.ndarray:
    """Contract every site with its input feature: ``(N,B,M,M)`` transfer mats.

    Reference equivalent: the ``A_TX`` list (``Network_class.py:227``), but as
    one batched matmul over all sites at once (contracting the ``d`` leg).
    """
    return jnp.einsum("nldr,bnd->nblr", sites, phi)


def left_env_stack(mats: jnp.ndarray, e0: jnp.ndarray) -> jnp.ndarray:
    """All left (prefix) environments: out[n] = e0 . mats[0] ... mats[n-1].

    Returns ``(N+1, B, M)``; ``out[0]`` is the broadcast boundary vector.
    Reference equivalent: ``l_cum_contraction`` (``Network_class.py:244-255``).
    """
    N, B, M, _ = mats.shape
    v0 = jnp.broadcast_to(e0, (B, M))

    def step(v, mat):
        v_new = jnp.einsum("bl,blr->br", v, mat)
        return v_new, v_new

    _, ys = jax.lax.scan(step, v0, mats)
    return jnp.concatenate([v0[None], ys], axis=0)


def right_env_stack(mats: jnp.ndarray, e0: jnp.ndarray) -> jnp.ndarray:
    """All right (suffix) environments: out[n] = mats[n] ... mats[N-1] . e0.

    Returns ``(N+1, B, M)``; ``out[N]`` is the broadcast boundary vector.
    Reference equivalent: ``r_cum_contraction`` (``Network_class.py:231-242``).
    """
    N, B, M, _ = mats.shape
    v0 = jnp.broadcast_to(e0, (B, M))

    def step(v, mat):
        v_new = jnp.einsum("blr,br->bl", mat, v)
        return v_new, v_new

    _, ys = jax.lax.scan(step, v0, mats, reverse=True)
    return jnp.concatenate([ys, v0[None]], axis=0)


def left_env_stack_fused(
    sites: jnp.ndarray, phi_t: jnp.ndarray, e0: jnp.ndarray
) -> jnp.ndarray:
    """Prefix environments with the site-input contraction fused in.

    ``sites (n, M, D, M)``, ``phi_t (n, B, D)`` (site-major). Equivalent to
    ``left_env_stack(site_mats(sites, phi), e0)`` but never materialises the
    ``(N, B, M, M)`` transfer-matrix stack in HBM -- the per-site matrices
    live only in registers/VMEM inside the scan body. This is the fusion the
    BASELINE north star asks for (embedding fused into the first
    contraction) generalised to every site.
    """
    n, B = phi_t.shape[0], phi_t.shape[1]
    M = sites.shape[1]
    v0 = jnp.broadcast_to(e0, (B, M))

    def step(v, x):
        A, p = x
        v_new = jnp.einsum("bl,bd,ldr->br", v, p, A)
        return v_new, v_new

    _, ys = jax.lax.scan(step, v0, (sites, phi_t))
    return jnp.concatenate([v0[None], ys], axis=0)


def right_env_stack_fused(
    sites: jnp.ndarray, phi_t: jnp.ndarray, e0: jnp.ndarray
) -> jnp.ndarray:
    """Suffix environments with the site-input contraction fused in.

    Equivalent to ``right_env_stack(site_mats(sites, phi), e0)``; see
    ``left_env_stack_fused``.
    """
    n, B = phi_t.shape[0], phi_t.shape[1]
    M = sites.shape[1]
    v0 = jnp.broadcast_to(e0, (B, M))

    def step(v, x):
        A, p = x
        v_new = jnp.einsum("ldr,bd,br->bl", A, p, v)
        return v_new, v_new

    _, ys = jax.lax.scan(step, v0, (sites, phi_t), reverse=True)
    return jnp.concatenate([ys, v0[None]], axis=0)


def left_env_stack_parallel(mats: jnp.ndarray, e0: jnp.ndarray) -> jnp.ndarray:
    """All left environments via ``associative_scan`` (chain-parallel).

    Same result as ``left_env_stack`` but with O(log N) sequential depth at
    the cost of O(N log N) M^3-matmuls (vs O(N) M^2-matvecs): profitable when
    the chain is sharded across devices (the scan's matmul tree parallelises
    over the site axis, the MPS analogue of sequence parallelism) or when N
    dominates and the MXU is idle. The reference's strictly sequential cache
    build (``Network_class.py:231-242``) is a prefix scan in disguise.
    """
    prods = jax.lax.associative_scan(
        lambda a, b: jnp.einsum("nblr,nbrs->nbls", a, b), mats, axis=0
    )  # prods[n] = mats[0] @ ... @ mats[n]
    envs = jnp.einsum("l,nblr->nbr", e0, prods)
    B, M = mats.shape[1], mats.shape[2]
    v0 = jnp.broadcast_to(e0, (B, M))
    return jnp.concatenate([v0[None], envs], axis=0)


def right_env_stack_parallel(mats: jnp.ndarray, e0: jnp.ndarray) -> jnp.ndarray:
    """All right environments via ``associative_scan`` (chain-parallel).

    Suffix products need right-to-left multiplication order; scan the
    flipped stack with a swapped-operand combine (still associative) and
    flip back.
    """
    rev = jnp.flip(mats, axis=0)
    prods_rev = jax.lax.associative_scan(
        lambda a, b: jnp.einsum("nblr,nbrs->nbls", b, a), rev, axis=0
    )  # prods_rev[k] = rev[k] @ rev[k-1] @ ... @ rev[0]
    prods = jnp.flip(prods_rev, axis=0)  # prods[n] = mats[n] @ ... @ mats[N-1]
    envs = jnp.einsum("nblr,r->nbl", prods, e0)
    B, M = mats.shape[1], mats.shape[2]
    v0 = jnp.broadcast_to(e0, (B, M))
    return jnp.concatenate([envs, v0[None]], axis=0)


def left_env_final_fused(
    sites: jnp.ndarray, phi_t: jnp.ndarray, e0: jnp.ndarray
) -> jnp.ndarray:
    """Final left environment ``(B, M)``, embedding fused, no stacks."""
    B, M = phi_t.shape[1], sites.shape[1]
    v0 = jnp.broadcast_to(e0, (B, M))

    def step(v, x):
        A, p = x
        return jnp.einsum("bl,bd,ldr->br", v, p, A), None

    v, _ = jax.lax.scan(step, v0, (sites, phi_t))
    return v


def right_env_final_fused(
    sites: jnp.ndarray, phi_t: jnp.ndarray, e0: jnp.ndarray
) -> jnp.ndarray:
    """Final right environment ``(B, M)``, embedding fused, no stacks."""
    B, M = phi_t.shape[1], sites.shape[1]
    v0 = jnp.broadcast_to(e0, (B, M))

    def step(v, x):
        A, p = x
        return jnp.einsum("ldr,bd,br->bl", A, p, v), None

    v, _ = jax.lax.scan(step, v0, (sites, phi_t), reverse=True)
    return v


def left_env_final(mats: jnp.ndarray, e0: jnp.ndarray) -> jnp.ndarray:
    """Just the final left environment ``(B, M)`` (no stacked prefixes)."""
    N, B, M, _ = mats.shape
    v0 = jnp.broadcast_to(e0, (B, M))

    def step(v, mat):
        return jnp.einsum("bl,blr->br", v, mat), None

    v, _ = jax.lax.scan(step, v0, mats)
    return v


def right_env_final(mats: jnp.ndarray, e0: jnp.ndarray) -> jnp.ndarray:
    """Just the final right environment ``(B, M)``."""
    N, B, M, _ = mats.shape
    v0 = jnp.broadcast_to(e0, (B, M))

    def step(v, mat):
        return jnp.einsum("blr,br->bl", mat, v), None

    v, _ = jax.lax.scan(step, v0, mats, reverse=True)
    return v


def chain_scores(
    left_env: jnp.ndarray,
    label_site: jnp.ndarray,
    x_label: jnp.ndarray,
    right_env: jnp.ndarray,
) -> jnp.ndarray:
    """Unactivated class scores ``(L, B)``.

    Closes the chain: left env x label-site x its input feature x right env.
    Matches the reference ``forward`` output layout (label axis first,
    ``Network_class.py:195-258``).
    """
    return jnp.einsum("bl,ldor,bd,br->ob", left_env, label_site, x_label, right_env)


def transfer_suffix_stack(sites: jnp.ndarray, e0: jnp.ndarray) -> jnp.ndarray:
    """Suffix products of L2 transfer matrices, ``(N+1, M, M)``.

    ``out[n] = T_n T_{n+1} ... T_{N-1} . (e0 e0^T)`` where
    ``T_n[l l', r r'] = sum_d A_n[l,d,r] A_n[l',d,r']`` -- the
    transfer-matrix contraction of a site with itself used by the exact L2
    norm of the full MPS (reference ``compute_L2_reg``,
    ``Network_class.py:1034-1063``).
    """
    N, M, D, _ = sites.shape
    E0 = jnp.outer(e0, e0)

    def step(E, A):
        E_new = jnp.einsum("ldr,rs,mds->lm", A, E, A)
        return E_new, E_new

    _, ys = jax.lax.scan(step, E0, sites, reverse=True)
    return jnp.concatenate([ys, E0[None]], axis=0)


def transfer_append(E: jnp.ndarray, A: jnp.ndarray) -> jnp.ndarray:
    """Extend a left L2 transfer product by one site: ``E' = A^T E A`` over d.

    ``E'[r,r'] = sum_{l l' d} A[l,d,r] E[l,l'] A[l',d,r']`` (reference's
    incremental ``left_contr`` extension, ``Network_class.py:1017-1029``).
    """
    return jnp.einsum("ldr,lm,mds->rs", A, E, A)


def env_apply_site(
    left_env: jnp.ndarray, x: jnp.ndarray, site: jnp.ndarray
) -> jnp.ndarray:
    """Extend a left environment by one (input-contracted) site.

    ``v'[b,r] = sum_{l,d} v[b,l] x[b,d] A[l,d,r]``.
    """
    return jnp.einsum("bl,bd,ldr->br", left_env, x, site)
