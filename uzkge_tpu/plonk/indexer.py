"""PLONK indexer (preprocessing): builds prover/verifier parameters.

Mirrors the reference indexer's outputs exactly (uzkge/src/plonk/indexer.rs:
240-536) — permutation sigma polynomials encoded onto cosets k_i*H, selector
polynomials, L1, Z_H^-1 coset values, the boolean/Anemoi/ecc/shuffle selector
polynomials, and commitments to all of them — but TPU-first in execution:
batched iFFT/coset-FFT over the stacked polynomial matrix and ONE batched
Lagrange-basis MSM for all commitments.

Quotient-domain coset evaluations are stored on the 8n radix-2 domain (see
ntt.py); commitment values are identical to the reference's (same
polynomials, same SRS), which tests verify against the embedded vk bins.
"""

from dataclasses import dataclass, field as dc_field
from typing import List, Optional

import jax.numpy as jnp

from ..constants.bn254 import R_MOD
from ..ff.jax_field import fr_ctx, L
from ..ntt.ntt import get_domain
from ..utils.chacha import choose_ks
from .cs import TurboCS, N_WIRES_PER_GATE, N_SELECTORS


@dataclass
class VerifierParams:
    """Host-side verifying key (reference PlonkVerifierParams,
    indexer.rs:153-193)."""

    cm_q_vec: List
    cm_s_vec: List
    cm_qb: object
    cm_prk_vec: List
    anemoi_generator: int
    anemoi_generator_inv: int
    k: List[int]
    cs_size: int
    public_vars_constraint_indices: List[int]
    lagrange_constants: List[int]
    with_shuffle: bool = True
    cm_q_ecc: object = None
    cm_shuffle_generator_vec: List = dc_field(default_factory=list)
    cm_shuffle_public_key_vec: List = dc_field(default_factory=list)
    edwards_a: int = 0


@dataclass
class ProverParams:
    """Device-resident proving key (reference PlonkProverParams,
    indexer.rs:77-139, reorganized as stacked arrays)."""

    verifier_params: VerifierParams
    permutation: List[int]
    n: int
    m: int
    # stacked coefficient arrays (rows, n, L) and coset evals (rows, m, L)
    q_coefs: jnp.ndarray          # (9, n, L)
    s_coefs: jnp.ndarray          # (5, n, L)
    qb_coefs: jnp.ndarray         # (n, L)
    q_prk_coefs: jnp.ndarray      # (4, n, L)
    q_coset: jnp.ndarray
    s_coset: jnp.ndarray
    qb_coset: jnp.ndarray
    q_prk_coset: jnp.ndarray
    l1_coset: jnp.ndarray         # (m, L)
    z_h_inv_coset: jnp.ndarray    # (factor, L)
    coset_elems: jnp.ndarray      # (m, L)  k1 * w_m^j  (mirrors coset_quotient)
    with_shuffle: bool = True
    q_ecc_coefs: Optional[jnp.ndarray] = None    # (n, L)
    q_gen_coefs: Optional[jnp.ndarray] = None    # (12, n, L)
    q_pk_coefs: Optional[jnp.ndarray] = None     # (12, n, L)
    q_ecc_coset: Optional[jnp.ndarray] = None
    q_gen_coset: Optional[jnp.ndarray] = None
    q_pk_coset: Optional[jnp.ndarray] = None
    # host-side caches used by the prover
    group: List[int] = dc_field(default_factory=list)
    s_evals_host: List[List[int]] = dc_field(default_factory=list)  # sigma evals per wire
    group_blob: bytes = b""  # packed LE scalars, lazily built for native z-poly


def lagrange_constant(group_root: int, n: int, constraint_index: int) -> int:
    """c_j = w^j / n  (closed form of helpers.rs:1170-1179's product)."""
    return pow(group_root, constraint_index, R_MOD) * pow(n, R_MOD - 2, R_MOD) % R_MOD


def encode_perm_value(perm_value: int, n: int, group: List[int], k: List[int]) -> int:
    """k_{perm//n} * w^{perm%n} (indexer.rs:196-208)."""
    return k[perm_value // n] * group[perm_value % n] % R_MOD


def indexer(cs: TurboCS, kzg, permutation=None, verifier_params: Optional[VerifierParams] = None,
            with_shuffle: bool = True) -> ProverParams:
    n = cs.size
    m = cs.quot_eval_dom_size()
    factor = m // n
    assert n * factor == m

    dom = get_domain(n)
    dom_m = get_domain(m)
    group = dom.elements()
    k = verifier_params.k if verifier_params is not None else choose_ks(R_MOD, N_WIRES_PER_GATE)
    k1 = k[1]
    no_verifier = verifier_params is None

    perm = permutation if permutation is not None else cs.compute_permutation()

    # ---- assemble all indexed polynomials as evaluation rows (host ints)
    sigma_rows = []
    for i in range(N_WIRES_PER_GATE):
        sigma_rows.append([encode_perm_value(perm[i * n + j], n, group, k) for j in range(n)])
    selector_rows = [list(cs.selectors[i]) for i in range(N_SELECTORS)]
    qb_row = [0] * n
    for i in cs.boolean_constraint_indices:
        qb_row[i] = 1
    prk_rows = cs.compute_anemoi_jive_selectors()

    rows = sigma_rows + selector_rows + [qb_row] + prk_rows
    layout = {"s": (0, 5), "q": (5, 14), "qb": (14, 15), "prk": (15, 19)}
    if with_shuffle:
        q_ecc_row = [0] * n
        for i in cs.shuffle_remark_indices_only():
            for j in range(cs.n_iteration_shuffle_scalar_mul):
                q_ecc_row[i + j] = 1
        gen_rows = cs.compute_shuffle_generator_selectors()
        rows += [q_ecc_row] + gen_rows
        layout["ecc"] = (19, 20)
        layout["gen"] = (20, 32)

    flat = [v for row in rows for v in row]
    evals_dev = fr_ctx.to_mont_limbs(flat).reshape(len(rows), n, L)
    coefs_dev = dom.ifft_batch(evals_dev)
    coset_dev = dom_m.coset_fft_batch(coefs_dev, k1)

    # ---- commitments (batched MSM over Lagrange bases, or coefficient path)
    if no_verifier:
        if kzg.lagrange_n == n:
            cms = kzg.commit_evals_batch(evals_dev)
        else:
            import numpy as np

            host_coefs = fr_ctx.from_mont_limbs(coefs_dev.reshape(-1, L))
            cms = []
            for r in range(len(rows)):
                cms.append(kzg.commit_coefs(host_coefs[r * n : (r + 1) * n]))
        s_cms = cms[layout["s"][0] : layout["s"][1]]
        q_cms = cms[layout["q"][0] : layout["q"][1]]
        qb_cm = cms[layout["qb"][0]]
        prk_cms = cms[layout["prk"][0] : layout["prk"][1]]
        if with_shuffle:
            ecc_cm = cms[layout["ecc"][0]]
            gen_cms = cms[layout["gen"][0] : layout["gen"][1]]
        lconsts = [lagrange_constant(dom.omega, n, ci) for ci in cs.public_vars_constraint_indices]
        verifier_params = VerifierParams(
            cm_q_vec=q_cms,
            cm_s_vec=s_cms,
            cm_qb=qb_cm,
            cm_prk_vec=prk_cms,
            anemoi_generator=cs.anemoi_generator,
            anemoi_generator_inv=cs.anemoi_generator_inv,
            k=k,
            cs_size=n,
            public_vars_constraint_indices=list(cs.public_vars_constraint_indices),
            lagrange_constants=lconsts,
            with_shuffle=with_shuffle,
            cm_q_ecc=ecc_cm if with_shuffle else None,
            cm_shuffle_generator_vec=gen_cms if with_shuffle else [],
            # faked with the generator's commitments until the joint public key
            # is installed (indexer.rs:472-478; refreshed by
            # shuffle.refresh_prover_params_public_key)
            cm_shuffle_public_key_vec=list(gen_cms) if with_shuffle else [],
            edwards_a=cs.edwards_a if with_shuffle else 0,
        )

    # ---- L1 and Z_H^-1 on the coset
    l1_evals = [n % R_MOD] + [0] * (n - 1)
    l1_coefs = dom.ifft(fr_ctx.to_mont_limbs(l1_evals))
    l1_coset = dom_m.coset_fft(l1_coefs, k1)

    zh_vals = []
    wm_n = pow(dom_m.omega, n, R_MOD)
    mult = pow(k1, n, R_MOD)
    for _ in range(factor):
        zh_vals.append((mult - 1) % R_MOD)
        mult = mult * wm_n % R_MOD
    zh_inv = [pow(v, R_MOD - 2, R_MOD) for v in zh_vals]
    z_h_inv_coset = fr_ctx.to_mont_limbs(zh_inv)

    coset_elems = fr_ctx.to_mont_limbs([k1 * w % R_MOD for w in dom_m.elements()])

    pp = ProverParams(
        verifier_params=verifier_params,
        permutation=perm,
        n=n,
        m=m,
        q_coefs=coefs_dev[layout["q"][0] : layout["q"][1]],
        s_coefs=coefs_dev[layout["s"][0] : layout["s"][1]],
        qb_coefs=coefs_dev[layout["qb"][0]],
        q_prk_coefs=coefs_dev[layout["prk"][0] : layout["prk"][1]],
        q_coset=coset_dev[layout["q"][0] : layout["q"][1]],
        s_coset=coset_dev[layout["s"][0] : layout["s"][1]],
        qb_coset=coset_dev[layout["qb"][0]],
        q_prk_coset=coset_dev[layout["prk"][0] : layout["prk"][1]],
        l1_coset=l1_coset,
        z_h_inv_coset=z_h_inv_coset,
        coset_elems=coset_elems,
        with_shuffle=with_shuffle,
        group=group,
        s_evals_host=sigma_rows,
    )
    if with_shuffle:
        pp.q_ecc_coefs = coefs_dev[layout["ecc"][0]]
        pp.q_gen_coefs = coefs_dev[layout["gen"][0] : layout["gen"][1]]
        pp.q_pk_coefs = pp.q_gen_coefs  # faked until pk refresh
        pp.q_ecc_coset = coset_dev[layout["ecc"][0]]
        pp.q_gen_coset = coset_dev[layout["gen"][0] : layout["gen"][1]]
        pp.q_pk_coset = pp.q_gen_coset
    return pp


def refresh_prover_params_public_key(pp: ProverParams, cs: TurboCS, kzg, shuffle_pk):
    """Recompute only the 12 q_shuffle_public_key polynomials after the joint
    public key changes (reference shuffle/src/gen_params/params.rs:57-129).
    Returns the 12 commitment points (the on-chain 24-element PKC)."""
    cs.load_shuffle_remark_parameters(shuffle_pk)
    n, m = pp.n, pp.m
    dom, dom_m = get_domain(n), get_domain(m)
    k1 = pp.verifier_params.k[1]
    rows = cs.compute_shuffle_public_key_selectors()
    flat = [v for row in rows for v in row]
    evals_dev = fr_ctx.to_mont_limbs(flat).reshape(len(rows), n, L)
    coefs = dom.ifft_batch(evals_dev)
    coset = dom_m.coset_fft_batch(coefs, k1)
    if kzg.lagrange_n == n:
        cms = kzg.commit_evals_batch(evals_dev)
    else:
        host_coefs = fr_ctx.from_mont_limbs(coefs.reshape(-1, L))
        cms = [kzg.commit_coefs(host_coefs[r * n : (r + 1) * n]) for r in range(len(rows))]
    pp.q_pk_coefs = coefs
    pp.q_pk_coset = coset
    pp.verifier_params.cm_shuffle_public_key_vec = cms
    if hasattr(pp, "_coef_blob_cache"):  # prover's static-blob cache is stale
        delattr(pp, "_coef_blob_cache")
    return cms
