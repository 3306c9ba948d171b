"""Groth16 proving against the reference's embedded ark proving key.

Implements ark-groth16 0.4's prover pipeline (LibsnarkReduction QAP) for the
reveal circuit synthesized by `ark_r1cs`:

  witness_map (r1cs_to_qap.rs):
      a[i<nc] = <A_i, z>, a[nc+j] = z_j (instance rows); b[i<nc] = <B_i, z>
      ifft -> coset_fft -> ab = a.b pointwise; c likewise;
      h_evals = (ab - c) / (g^n - 1); h = coset_ifft(h_evals)[: n-1]

  prove (prover.rs):
      A  = alpha + <z, a_query>  + r*delta              (G1)
      B  = beta  + <z, b_g2_query> + s*delta            (G2)
      B1 = beta1 + <z, b_g1_query> + s*delta1           (G1)
      C  = <witness, l_query> + <h, h_query> + s*A + r*B1 - r*s*delta1

The verifier check (deployed Groth16Verifier.sol semantics):
      e(A, B) = e(alpha, beta) * e(sum z_i IC_i, gamma) * e(C, delta)

Domain: ark Radix2EvaluationDomain(8192) — omega from the 2-adic root with
GENERATOR = 5; coset generator g = 5.
"""

from typing import Dict, List, Optional, Sequence, Tuple

from ..constants.bn254 import R_MOD, FR_GENERATOR, FR_TWO_ADIC_ROOT_OF_UNITY, FR_TWO_ADICITY
from ..curve.bn254 import g1_add, g1_neg, g1_mul, g2_add, g2_neg, g2_mul
from ..pcs.pairing import multi_pairing_is_one
from .ark_pk import ArkGroth16Pk

R = R_MOD


# ----------------------------------------------------------------- host NTT
def _root_of_unity(n: int) -> int:
    assert n & (n - 1) == 0 and n <= (1 << FR_TWO_ADICITY)
    return pow(FR_TWO_ADIC_ROOT_OF_UNITY, (1 << FR_TWO_ADICITY) // n, R)


def _ntt(vals: List[int], omega: int) -> List[int]:
    """Iterative radix-2 DIT NTT, natural order in and out."""
    n = len(vals)
    a = list(vals)
    # bit-reverse permute
    j = 0
    for i in range(1, n):
        bit = n >> 1
        while j & bit:
            j ^= bit
            bit >>= 1
        j |= bit
        if i < j:
            a[i], a[j] = a[j], a[i]
    length = 2
    while length <= n:
        wlen = pow(omega, n // length, R)
        half = length // 2
        for start in range(0, n, length):
            w = 1
            for k in range(start, start + half):
                u, v = a[k], a[k + half] * w % R
                a[k] = (u + v) % R
                a[k + half] = (u - v) % R
                w = w * wlen % R
        length <<= 1
    return a


class HostDomain:
    def __init__(self, n: int):
        self.n = n
        self.omega = _root_of_unity(n)
        self.omega_inv = pow(self.omega, R - 2, R)
        self.n_inv = pow(n, R - 2, R)
        self.g = FR_GENERATOR
        self.g_inv = pow(self.g, R - 2, R)

    def fft(self, coeffs):
        return _ntt(coeffs, self.omega)

    def ifft(self, evals):
        out = _ntt(evals, self.omega_inv)
        return [v * self.n_inv % R for v in out]

    def coset_fft(self, coeffs):
        gk = 1
        scaled = []
        for c in coeffs:
            scaled.append(c * gk % R)
            gk = gk * self.g % R
        return self.fft(scaled)

    def coset_ifft(self, evals):
        coeffs = self.ifft(evals)
        gk = 1
        out = []
        for c in coeffs:
            out.append(c * gk % R)
            gk = gk * self.g_inv % R
        return out


# ------------------------------------------------------------- host Pippenger
#
# Generic jacobian-coordinate Pippenger parameterized by base-field ops, so
# one implementation serves G1 (ints mod q) and G2 (Fq2 pairs).  Jacobian
# avoids the per-addition modular inversion of the affine helpers in
# curve/bn254.py — one inversion per MSM instead of one per add.


class _FieldOps:
    __slots__ = ("mul", "add", "sub", "inv", "zero", "one", "is_zero")

    def __init__(self, mul, add, sub, inv, zero, one, is_zero):
        self.mul, self.add, self.sub, self.inv = mul, add, sub, inv
        self.zero, self.one, self.is_zero = zero, one, is_zero


def _jac_double(F, p):
    x, y, z = p
    if F.is_zero(z):
        return p
    # a = 0 doubling: 2M + 5S
    a = F.mul(x, x)
    b = F.mul(y, y)
    c = F.mul(b, b)
    t = F.add(x, b)
    d = F.sub(F.sub(F.mul(t, t), a), c)
    d = F.add(d, d)
    e = F.add(F.add(a, a), a)
    f = F.mul(e, e)
    x3 = F.sub(f, F.add(d, d))
    c8 = F.add(F.add(F.add(c, c), F.add(c, c)), F.add(F.add(c, c), F.add(c, c)))
    y3 = F.sub(F.mul(e, F.sub(d, x3)), c8)
    z3 = F.mul(F.add(y, y), z)
    return (x3, y3, z3)


def _jac_add(F, p, q):
    x1, y1, z1 = p
    x2, y2, z2 = q
    if F.is_zero(z1):
        return q
    if F.is_zero(z2):
        return p
    z1z1 = F.mul(z1, z1)
    z2z2 = F.mul(z2, z2)
    u1 = F.mul(x1, z2z2)
    u2 = F.mul(x2, z1z1)
    s1 = F.mul(F.mul(y1, z2), z2z2)
    s2 = F.mul(F.mul(y2, z1), z1z1)
    h = F.sub(u2, u1)
    r = F.sub(s2, s1)
    if F.is_zero(h):
        if F.is_zero(r):
            return _jac_double(F, p)
        return (F.one, F.one, F.zero)
    i = F.add(h, h)
    i = F.mul(i, i)
    j = F.mul(h, i)
    r2 = F.add(r, r)
    v = F.mul(u1, i)
    x3 = F.sub(F.sub(F.mul(r2, r2), j), F.add(v, v))
    s1j = F.mul(s1, j)
    y3 = F.sub(F.mul(r2, F.sub(v, x3)), F.add(s1j, s1j))
    z3 = F.sub(F.mul(F.add(z1, z2), F.add(z1, z2)), F.add(z1z1, z2z2))
    z3 = F.mul(z3, h)
    return (x3, y3, z3)


def _jac_mixed_add(F, p, q_affine):
    """p (jacobian) + q (affine, z=1)."""
    x1, y1, z1 = p
    x2, y2 = q_affine
    if F.is_zero(z1):
        return (x2, y2, F.one)
    z1z1 = F.mul(z1, z1)
    u2 = F.mul(x2, z1z1)
    s2 = F.mul(F.mul(y2, z1), z1z1)
    h = F.sub(u2, x1)
    r = F.sub(s2, y1)
    if F.is_zero(h):
        if F.is_zero(r):
            return _jac_double(F, p)
        return (F.one, F.one, F.zero)
    hh = F.mul(h, h)
    i = F.add(F.add(hh, hh), F.add(hh, hh))
    j = F.mul(h, i)
    r2 = F.add(r, r)
    v = F.mul(x1, i)
    x3 = F.sub(F.sub(F.mul(r2, r2), j), F.add(v, v))
    y1j = F.mul(y1, j)
    y3 = F.sub(F.mul(r2, F.sub(v, x3)), F.add(y1j, y1j))
    z3 = F.sub(F.sub(F.mul(F.add(z1, h), F.add(z1, h)), z1z1), hh)
    return (x3, y3, z3)


def _jac_to_affine(F, p):
    x, y, z = p
    if F.is_zero(z):
        return None
    zi = F.inv(z)
    zi2 = F.mul(zi, zi)
    return (F.mul(x, zi2), F.mul(y, F.mul(zi2, zi)))


def _pippenger(points: Sequence, scalars: Sequence[int], F: _FieldOps, c: int = 8):
    """Windowed bucket MSM over affine host points (None = identity)."""
    pairs = [(p, s % R) for p, s in zip(points, scalars) if p is not None and s % R]
    if not pairs:
        return None
    windows = (256 + c - 1) // c
    mask = (1 << c) - 1
    inf = (F.one, F.one, F.zero)
    acc = inf
    for w in range(windows - 1, -1, -1):
        if not F.is_zero(acc[2]):
            for _ in range(c):
                acc = _jac_double(F, acc)
        buckets: Dict[int, tuple] = {}
        shift = w * c
        for p, s in pairs:
            d = (s >> shift) & mask
            if d:
                cur = buckets.get(d)
                buckets[d] = (p[0], p[1], F.one) if cur is None else _jac_mixed_add(F, cur, p)
        if not buckets:
            continue
        running = inf
        win_sum = inf
        for d in range(max(buckets.keys()), 0, -1):
            b = buckets.get(d)
            if b is not None:
                running = _jac_add(F, running, b)
            win_sum = _jac_add(F, win_sum, running)
        acc = _jac_add(F, acc, win_sum)
    return _jac_to_affine(F, acc)


def _g1_ops() -> _FieldOps:
    from ..constants.bn254 import Q_MOD

    q = Q_MOD
    return _FieldOps(
        mul=lambda a, b: a * b % q,
        add=lambda a, b: (a + b) % q,
        sub=lambda a, b: (a - b) % q,
        inv=lambda a: pow(a, q - 2, q),
        zero=0,
        one=1,
        is_zero=lambda a: a == 0,
    )


def _g2_ops() -> _FieldOps:
    from ..curve.bn254 import fq2_add, fq2_sub, fq2_mul, fq2_inv

    return _FieldOps(
        mul=fq2_mul,
        add=fq2_add,
        sub=fq2_sub,
        inv=fq2_inv,
        zero=(0, 0),
        one=(1, 0),
        is_zero=lambda a: a == (0, 0),
    )


_G1F = None
_G2F = None


def g1_msm_host(points, scalars):
    global _G1F
    if _G1F is None:
        _G1F = _g1_ops()
    return _pippenger(points, scalars, _G1F)


def g2_msm_host(points, scalars):
    global _G2F
    if _G2F is None:
        _G2F = _g2_ops()
    return _pippenger(points, scalars, _G2F)


# ----------------------------------------------------------------- witness map
def qap_witness_map(
    a_rows: List[Dict[int, int]],
    b_rows: List[Dict[int, int]],
    c_rows: List[Dict[int, int]],
    assignment: List[int],
    num_instance: int,
    domain_n: int,
) -> List[int]:
    """h coefficients (len n-1) per LibsnarkReduction::witness_map."""
    nc = len(a_rows)
    dom = HostDomain(domain_n)

    def eval_rows(rows):
        out = [0] * domain_n
        for i, row in enumerate(rows):
            acc = 0
            for col, coeff in row.items():
                acc += coeff * assignment[col]
            out[i] = acc % R
        return out

    a = eval_rows(a_rows)
    for j in range(num_instance):
        a[nc + j] = assignment[j]
    b = eval_rows(b_rows)
    c = eval_rows(c_rows)

    a = dom.coset_fft(dom.ifft(a))
    b = dom.coset_fft(dom.ifft(b))
    c = dom.coset_fft(dom.ifft(c))

    zinv = pow((pow(dom.g, domain_n, R) - 1) % R, R - 2, R)
    h_evals = [(ai * bi - ci) % R * zinv % R for ai, bi, ci in zip(a, b, c)]
    h = dom.coset_ifft(h_evals)
    assert h[domain_n - 1] == 0, "QAP division remainder: matrices do not match"
    return h[: domain_n - 1]


# ----------------------------------------------------------------------- prove
def groth16_prove_with_pk(
    pk: ArkGroth16Pk,
    matrices,
    assignment: List[int],
    num_instance: int,
    r: int,
    s: int,
):
    """Produce (A_g1, B_g2, C_g1) for the assignment under the parsed ark pk."""
    a_rows, b_rows, c_rows = matrices
    h = qap_witness_map(a_rows, b_rows, c_rows, assignment, num_instance, pk.domain_size)

    z = assignment
    wit = z[num_instance:]

    A = g1_add(pk.vk.alpha_g1, g1_msm_host(pk.a_query, z))
    A = g1_add(A, g1_mul(pk.delta_g1, r))

    B1 = g1_add(pk.beta_g1, g1_msm_host(pk.b_g1_query, z))
    B1 = g1_add(B1, g1_mul(pk.delta_g1, s))

    B = g2_add(pk.vk.beta_g2, g2_msm_host(pk.b_g2_query, z))
    B = g2_add(B, g2_mul(pk.vk.delta_g2, s))

    C = g1_add(g1_msm_host(pk.l_query, wit), g1_msm_host(pk.h_query, h))
    C = g1_add(C, g1_mul(A, s))
    C = g1_add(C, g1_mul(B1, r))
    C = g1_add(C, g1_neg(g1_mul(pk.delta_g1, r * s % R)))
    return A, B, C


def groth16_verify_with_vk(vk, proof, public_inputs: List[int]) -> bool:
    """e(A,B) e(-alpha,beta) e(-IC,gamma) e(-C,delta) == 1."""
    A, B, C = proof
    ic = vk.gamma_abc_g1[0]
    for base, val in zip(vk.gamma_abc_g1[1:], public_inputs):
        ic = g1_add(ic, g1_mul(base, val))
    return multi_pairing_is_one(
        [
            (A, B),
            (g1_neg(vk.alpha_g1), vk.beta_g2),
            (g1_neg(ic), vk.gamma_g2),
            (g1_neg(C), vk.delta_g2),
        ]
    )
