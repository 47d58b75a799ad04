"""RNS-BFV scheme: keygen, encrypt/decrypt, batching encoder, homomorphic
add/sub/plain-mult, Galois rotations with special-prime key switching.

This module replaces Microsoft SEAL's BFV evaluator (the reference's only
native crypto engine, src/runtime/SealCiphertextFactory.cpp). Everything on
the evaluation path is expressed as per-limb uint32 array math over
[L, n]-shaped RNS polynomials so it runs through either modarith engine:
np64 (host/NumPy oracle) or jx32 (TPU/JAX, jit-able end to end).

Key switching uses the hybrid (SEAL ≥3.6 / Han–Ki style) construction with a
configurable digit size k = BfvParams.ks_digits (number of special primes):
the L data primes are partitioned into α = ⌈L/k⌉ digits Q_j (≤ k primes
each), P = p_1···p_k, and
  ksk_j = ( -(a_j·s + e_j) + P·W_j·s2 ,  a_j )   over base q∪P,
  W_j   = Q̂_j·[Q̂_j^{-1}]_{Q_j}   (Q̂_j = q/Q_j; CRT basis element of Q_j),
so that Σ_j ModUp([d]_{Q_j})·ksk_j = P·d·s2 + (small) (mod qP) — the fast
base conversion's +u·Q_j overflow multiplies Q_j·W_j ≡ 0 (mod q) and the
factor P kills it mod qP — and exact division by P (k successive centered
divisions) yields d·s2 + tiny error mod q. k=1 degenerates to the
special-prime construction (W_i = ω_i ≡ δ_ij mod q_j). The payoff: the
expensive decomposition shrinks from L·(L+1) to α·(L+k) forward-NTT rows.

Decryption/decoding run on the host with exact bigints (CRT compose +
rounding) — matching the reference's CPU decrypt boundary (the
decrypt-and-compare protocol of RuntimeVisitorTest.cpp:40-66).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from abc_tpu.crypto.ntt import NttContext, bit_reverse
from abc_tpu.crypto.numthy import centered, modinv
from abc_tpu.crypto.params import BfvParams
from abc_tpu.crypto.prng import derive_key, split_domain, uniform_rns_np

_SLOT_MAP_CACHE: Dict[int, np.ndarray] = {}
from abc_tpu.ops.modarith import barrett_mu
from abc_tpu.utils.errors import RuntimeExecutionError


@dataclass
class Plaintext:
    """Batched plaintext: polynomial coefficients mod t, [n] uint32."""
    coeffs: np.ndarray


@dataclass
class BfvCiphertext:
    """data: [k, L, n] uint32, coefficient domain, k = 2 (or 3 pre-relin)."""
    data: object  # np.ndarray | jnp.ndarray

    @property
    def size(self) -> int:
        return self.data.shape[0]


class BfvContext:
    """Keys + precomputed tables for one BFV parameter set."""

    def __init__(self, params: BfvParams):
        self.params = params
        # operation counters (used by tests to assert the compiler/runtime
        # issues the expected number of expensive ops: relinearizations,
        # Galois key switches, key-switch decompositions and cache hits,
        # BEHZ ct*ct multiplies)
        self.counters: Dict[str, int] = {
            "relin": 0, "galois": 0, "decomp": 0, "decomp_hit": 0,
            "mult": 0, "op_ntt": 0, "op_ntt_hit": 0}
        n, moduli = params.n, params.coeff_modulus
        bitsizes = {q.bit_length() for q in moduli}
        assert len(bitsizes) == 1, \
            "uniform coeff-prime sizes required (single-subtract limb lifting)"
        self._on_device = params.engine == "jx32"

        # host (np64) contexts for keygen/encrypt/decrypt; engine contexts for
        # the homomorphic evaluation path
        self.hq = NttContext(n, params.data_primes, engine="np64")
        self.hqp = NttContext(n, moduli, engine="np64")
        if self._on_device:
            self.ntt_q = NttContext(n, params.data_primes, engine="jx32")
            self.ntt_qp = NttContext(n, moduli, engine="jx32")
        else:
            self.ntt_q, self.ntt_qp = self.hq, self.hqp
        self.ntt_t = NttContext(n, [params.plain_modulus], engine="np64")
        self.engine = self.ntt_q.engine

        L, P, q_big, t = params.L, params.special_prime, params.q, params.plain_modulus
        qs = params.data_primes
        k, alpha = params.ks_digits, params.num_ks_digits
        self.full = L + k                      # size of the extended base q∪P

        # --- scalar tables (host bigints → uint32 arrays) ---------------------
        host: Dict[str, np.ndarray] = {}
        host["q_full"] = np.asarray(moduli, dtype=np.uint32).reshape(-1, 1)
        host["mu_full"] = np.asarray([barrett_mu(q) for q in moduli],
                                     dtype=np.uint32).reshape(-1, 1)
        delta = q_big // t
        host["delta_mod_q"] = np.asarray([delta % q for q in qs],
                                         dtype=np.uint32).reshape(-1, 1)
        # P·W_j mod every modulus for the ksk construction (see module doc)
        factors = np.zeros((alpha, self.full, 1), dtype=np.uint32)
        digit_products = []
        for j, grp in enumerate(params.digit_groups):
            Qj = 1
            for i in grp:
                Qj *= qs[i]
            digit_products.append(Qj)
            qhat = q_big // Qj
            w = qhat * modinv(qhat % Qj, Qj)          # ≡ δ_{jm} (mod Q_m)
            for r, qr in enumerate(moduli):
                factors[j, r, 0] = (P * w) % qr
        host["ks_factors"] = factors
        # mod-switch-down: divide by one special prime at a time (specials in
        # reverse order); per-step tables over the remaining base
        self._msd_half = []
        for s in range(k):
            ps = params.special_primes[s]
            rest = moduli[:L + s]
            host[f"msd_p_mod_{s}"] = np.asarray(
                [ps % r for r in rest], dtype=np.uint32).reshape(-1, 1)
            host[f"msd_p_inv_{s}"] = np.asarray(
                [modinv(ps, r) for r in rest], dtype=np.uint32).reshape(-1, 1)
            self._msd_half.append(ps >> 1)
        if k > 1:
            # digit fast-base-conversion tables: per digit j and local limb i,
            # y_{j,i} = [d·(Q_j/q_{j,i})^{-1}]_{q_{j,i}}, then
            # D_{j,r} = Σ_i y_{j,i}·(Q_j/q_{j,i}) mod r. Short digit groups
            # are padded with inv_qhat=0 rows (contribute exactly 0).
            gather = np.zeros((alpha, k), dtype=np.int64)
            inv_qhat = np.zeros((alpha, k, 1), dtype=np.uint32)
            q_src = np.ones((alpha, k, 1), dtype=np.uint32) * np.uint32(qs[0])
            qhat_full = np.zeros((alpha, k, self.full, 1), dtype=np.uint32)
            for j, grp in enumerate(params.digit_groups):
                Qj = digit_products[j]
                for i, gi in enumerate(grp):
                    qi = qs[gi]
                    qh = Qj // qi
                    gather[j, i] = gi
                    q_src[j, i, 0] = qi
                    inv_qhat[j, i, 0] = modinv(qh % qi, qi)
                    for r, qr in enumerate(moduli):
                        qhat_full[j, i, r, 0] = qh % qr
            self._dec_gather = gather
            host["dec_inv_qhat"] = inv_qhat
            host["dec_q_src"] = q_src
            host["dec_mu_src"] = np.vectorize(barrett_mu)(
                q_src.astype(np.int64)).astype(np.uint32)
            host["dec_qhat_full"] = qhat_full
        self._host = host

        # fast-decrypt tables: m = round(Σ_l y_l·t/q_l) mod t with
        # y_l = [v_l·(q/q_l)^{-1}]_{q_l} (exact CRT scale-and-round; each
        # f64 term y_l·t/q_l has numerator < 2^50, so the summed rounding
        # error is < L·2^-29 — far below the 1/2 decision boundary unless
        # the ciphertext is at noise capacity, where we fall back to exact
        # bigints)
        self._dec_qhat_inv = np.asarray(
            [modinv((q_big // qi) % qi, qi) for qi in qs],
            dtype=np.uint64).reshape(L, 1)
        self._dec_t_over_q = (float(t) / np.asarray(qs, dtype=np.float64)
                              ).reshape(L, 1)
        # device decrypt tables (u32 fixed-point exact scale-and-round):
        # m = round(Σ_l y_l·θ_l) mod t with θ_l = t·q̂_l/q = t/q_l < 1
        # (t is below every prime, so the integer CRT part vanishes);
        # θ_l is carried as a 64-bit fixed-point pair (f_hi, f_lo), the
        # fractional sum in an exact u32 accumulator with carries.
        host["dec_qinv"] = self._dec_qhat_inv.astype(np.uint32)
        host["dec_qinv_sh"] = np.asarray(
            [(int(v) << 32) // qi for v, qi in zip(
                self._dec_qhat_inv.reshape(-1), qs)],
            dtype=np.uint64).astype(np.uint32).reshape(L, 1)
        theta_fp = [((t << 64) // qi) for qi in qs]          # floor(θ·2^64)
        host["dec_f_hi"] = np.asarray([f >> 32 for f in theta_fp],
                                      dtype=np.uint64).astype(np.uint32
                                                              ).reshape(L, 1)
        host["dec_f_lo"] = np.asarray([f & 0xFFFFFFFF for f in theta_fp],
                                      dtype=np.uint64).astype(np.uint32
                                                              ).reshape(L, 1)
        self._dec_mu_t = (1 << 32) // t

        if self._on_device:
            import jax
            import jax.numpy as jnp
            self._dev = jnp.asarray
            self._tab = jax.device_put(host)   # ONE batched transfer
        else:
            self._dev = lambda x: x
            self._tab = host

        # --- batching slot map -------------------------------------------------
        self._slot_to_pos = self._build_slot_map(n)

        # --- keys ----------------------------------------------------------------
        # Two randomness sources, both shared bit-for-bit by the np64 and
        # jx32 engines, keyed from SEPARATE domains of the master seed
        # (crypto/prng.py split_domain):
        #   * self.rng (numpy Generator, SECRET domain) — SMALL host draws
        #     only (ternary secrets, Gaussian errors); engines must consume
        #     it in the same order.
        #   * the counter PRNG (PUBLIC domain) — every UNIFORM polynomial
        #     (the `a` of each RLWE sample), keyed by (public seed, stream
        #     label): draw-order independent, and generatable ON DEVICE
        #     inside the jitted keygen/encrypt paths, so key-sized arrays
        #     never cross the host↔device boundary (SEAL's seeded-key
        #     trick). Only self.public_seed may ever be serialized: it
        #     regenerates the `a` halves but reveals nothing about the
        #     secret/error draws (those live in the other domain).
        self._master_seed = params.seed if params.seed is not None else \
            int(np.random.default_rng().integers(0, 2 ** 63))
        self._prng_seed = split_domain(self._master_seed, "public")
        self._sec_seed = split_domain(self._master_seed, "secret")
        self.rng = np.random.default_rng(self._sec_seed)
        self._enc_counter = 0
        self._keygen()
        self.relin_key: Optional[Tuple] = None
        self.galois_keys: Dict[int, Tuple] = {}
        self._perm_cache: Dict[int, Tuple] = {}
        # BEHZ multiply context: deferred out of the keygen phase; built by
        # ensure_eval_ready (pre-trace) or lazily at first multiply
        self._behz = None

    def _get_behz(self):
        """The BEHZ multiply context, cached only when no trace is active
        (a context built in-trace carries tracer tables that must not
        outlive the trace)."""
        if self._behz is None:
            from abc_tpu.crypto.behz import BehzContext
            from abc_tpu.utils.tracing import trace_state_clean
            bz = BehzContext(self.params, ntt_q=self.ntt_q)
            if not trace_state_clean():
                return bz
            self._behz = bz
        return self._behz

    def ensure_eval_ready(self) -> None:
        """Eagerly build everything the HOT evaluation path needs — the
        BEHZ multiply context and the Pallas NTT kernels — OUTSIDE any jit
        trace (in-trace construction would bake their device tables as
        trace-local tracers, and the table builds cost ~2 s that must not
        land inside a timed phase). The jit executor calls this before
        tracing; eager interpreter paths hit the same lazy builds on first
        use (which is trace-clean there)."""
        self._get_behz()
        if self._on_device:
            self.ntt_q.warm()
            self.ntt_qp.warm()

    # convenient table views ----------------------------------------------------
    @property
    def q_q(self):
        return self._tab["q_full"][:self.params.L]

    @property
    def mu_q(self):
        return self._tab["mu_full"][:self.params.L]

    # ------------------------------------------------------------------ sampling
    def _sample_ternary(self) -> np.ndarray:
        return self.rng.integers(-1, 2, size=self.params.n).astype(np.int64)

    def _sample_error(self, rng=None) -> np.ndarray:
        rng = self.rng if rng is None else rng
        e = np.rint(rng.normal(0.0, self.params.error_std, self.params.n))
        return np.clip(e, -19, 19).astype(np.int64)

    def _lift_signed(self, coeffs: np.ndarray, num_limbs: int) -> np.ndarray:
        """Signed int coeffs → [L', n] uint32 residues."""
        moduli = self.params.coeff_modulus[:num_limbs]
        out = np.empty((len(moduli), self.params.n), dtype=np.uint32)
        for j, qj in enumerate(moduli):
            out[j] = np.mod(coeffs, qj).astype(np.uint32)
        return out

    @property
    def public_seed(self) -> int:
        """The PUBLIC-domain seed: regenerates every uniform `a` component
        (public key, switching-key digits) via (public_seed, stream). This
        is the ONLY seed a seeded-key serializer may publish — the secret
        and error draws are keyed from a separate domain of the master
        seed (crypto/prng.py split_domain), so the public seed does not
        let a holder reconstruct e and recover s from b = -(a·s+e)."""
        return self._prng_seed

    def _uniform_rns(self, num_limbs: int, stream: str) -> np.ndarray:
        """Uniform element of Z_q in RNS (independent uniform residues are
        uniform over Z_q by the CRT bijection), drawn from the counter PRNG
        at (PUBLIC-domain seed, stream) — host path; the device paths
        regenerate the identical array in-jit (crypto/prng.py)."""
        return uniform_rns_np(self._prng_seed, stream,
                              self.params.coeff_modulus[:num_limbs],
                              self.params.n)

    # ------------------------------------------------------------------ keygen
    def _keygen(self) -> None:
        L, full = self.params.L, self.full
        self.s_coeffs = self._sample_ternary()
        e_pk = self._sample_error()
        self.s_ntt_full = self.hqp.fwd(self._lift_signed(self.s_coeffs, full))
        # public key over the data base q, NTT domain: (b = -(a·s+e), a).
        # The uniform `a` comes from the counter PRNG at stream "pk", so the
        # jx32 device keygen below regenerates the identical key in-jit.
        a_ntt = self._uniform_rns(L, "pk")     # uniform is uniform in NTT domain
        e_ntt = self.hq.fwd(self._lift_signed(e_pk, L))
        as_ntt = self.hq.pointwise_mul(a_ntt, self.s_ntt_full[:L])
        self.pk_b_ntt = self.hq.sub(self.hq.neg(as_ntt), e_ntt)
        self.pk_a_ntt = a_ntt
        if self._on_device:
            self._keygen_device(e_pk)

    # ------------------------------------------------- device (jx32) key paths
    #
    # On the jx32 engine every key-sized array is COMPUTED on the device
    # inside jitted builders: the uniform components are regenerated from
    # their (seed, stream) counters, only the n-sized host samples (secret,
    # errors) and n-sized results cross the host↔device boundary. On the
    # axon-tunneled TPU of this rig (≈20 MB/s) that turns ~23 MB/key
    # transfers (the round-2 bench lost ~10 s to them, BENCH_r02 config6
    # t_input_encryption) into ~0.1 MB. Everything stays bit-identical to
    # the np64 host path (tests/test_prng.py, test_bfv.py).

    def _keygen_device(self, e_pk: Optional[np.ndarray]) -> None:
        """Install the device key copies (s_ntt_full, pk, and the
        pre-sliced decrypt view — slicing _dev_s_ntt_full EAGERLY inside
        decrypt() cost a full ~25 ms dispatch per call on the tunneled rig,
        making t_decryption two round trips instead of one; round-5).

        On an accelerator backend (or ABC_TPU_DEVICE_KEYGEN=1) the copies
        are COMPUTED on device from the [n] int8 secret/error samples
        (_keygen_dev_jit, ~32 KB transferred, bit-identical); on CPU JAX
        — the test environment, where transfers are free and dozens of
        small contexts would each pay a fresh XLA compile — they are plain
        batched transfers. e_pk=None (checkpoint restore) always uses the
        transfer path: the restored keys are data, not re-derivable."""
        import os

        import jax
        use_dev_build = e_pk is not None and (
            jax.default_backend() != "cpu"
            or os.environ.get("ABC_TPU_DEVICE_KEYGEN") == "1")
        if use_dev_build:
            import jax.numpy as jnp
            from abc_tpu.crypto.prng import derive_key
            k0, k1 = derive_key(self._prng_seed, "pk")
            ntt_qp, ntt_q = self.ntt_qp, self.ntt_q
            outs = _keygen_dev_jit(
                tuple(self.params.coeff_modulus[:self.params.L]))(
                jnp.asarray(self.s_coeffs.astype(np.int8)),
                jnp.asarray(e_pk.astype(np.int8)),
                jnp.uint32(k0), jnp.uint32(k1),
                self._tab["q_full"], self._tab["mu_full"],
                ntt_qp.fwd_tw, ntt_qp.fwd_tw_sh,
                self.q_q, self.mu_q, ntt_q.fwd_tw, ntt_q.fwd_tw_sh)
            (self._dev_s_ntt_full, self._dev_pk_b, self._dev_pk_a,
             self._dev_s_ntt_L) = outs
            return
        self._dev_s_ntt_full, self._dev_pk_b, self._dev_pk_a = \
            jax.device_put((self.s_ntt_full, self.pk_b_ntt, self.pk_a_ntt))
        self._dev_s_ntt_L = jax.device_put(
            np.ascontiguousarray(self.s_ntt_full[:self.params.L]))

    def sync_device_keys(self) -> None:
        """Refresh the jx32 device key copies from the HOST arrays. Must be
        called after any out-of-band replacement of s_coeffs/s_ntt_full/pk
        (checkpoint restore): the constructor's fresh keygen installed
        device copies of DIFFERENT keys, and encrypt/decrypt/device key
        builds read the device copies (advisor r4 — a restored jx32
        context silently used the wrong secret). No-op on host engines."""
        if self._on_device:
            self._keygen_device(None)

    def _ksk_errors(self, stream: str) -> np.ndarray:
        """[α, n] int64 Gaussian errors for one switching key, drawn from a
        generator keyed by (SECRET-domain seed, stream) — order-independent,
        so both engines (and repeated builds) produce the identical key;
        publishing the public seed does not expose these draws."""
        from abc_tpu.crypto.prng import seeded_rng
        rng_e = seeded_rng(self._sec_seed, f"{stream}/e")
        # float32 ziggurat: same clipped discrete Gaussian after rounding,
        # ~40% cheaper — the K·α·n key-error draws were 51 ms of the
        # n=16384 t_keygen (round-5 profile), half the batched key build.
        # Both engines draw through this one function, so cross-engine key
        # material stays identical.
        e = np.rint(rng_e.standard_normal(
            (self.params.num_ks_digits, self.params.n), dtype=np.float32)
            * np.float32(self.params.error_std))
        return np.clip(e, -19, 19).astype(np.int64)

    def _ksk_target_host(self, key_id: str) -> np.ndarray:
        """Host NTT-domain target secret for a key id: s² for "relin",
        τ_g(s) for "galois_<g>".

        τ_g is applied in the EVALUATION domain as the pure permutation
        out[p] = in[perm(p)] (_galois_perm_eval — exactly the identity the
        hoisted rotation path uses): τ_g(s)'s eval at ψ^e is s's eval at
        ψ^{e·g}, so no coefficient-domain automorphism + forward NTT is
        needed. Bit-identical to transform-after-automorphism, and it cuts
        the per-galois-key host cost from a full [L+k, n] NTT (~40 ms at
        n=16384) to a numpy gather (<1 ms) — the difference between winning
        and losing the reference's t_keygen column at reference scale."""
        if key_id == "relin":
            return self.hqp.pointwise_mul(self.s_ntt_full, self.s_ntt_full)
        g = int(key_id[len("galois_"):])
        return np.ascontiguousarray(
            self.s_ntt_full[..., self._galois_perm_eval(g)])

    def _make_ksk_host(self, s2_ntt_full: np.ndarray, stream: str) -> Tuple:
        """Host (np64) construction of one switching key toward target
        secret s2 (NTT domain over q∪P): (ksk_b, ksk_a), each [α, L+k, n].
        `stream` labels the uniform/error components ("relin",
        "galois_<g>") so any engine regenerates the same key material from
        (seed, stream) alone."""
        errors = self._ksk_errors(stream)
        h = self.hqp
        full, n = self.full, self.params.n
        alpha = self.params.num_ks_digits
        ksk_b = np.empty((alpha, full, n), dtype=np.uint32)
        ksk_a = np.empty((alpha, full, n), dtype=np.uint32)
        factors = self._host["ks_factors"]
        for i in range(alpha):
            a_i = self._uniform_rns(full, f"{stream}/d{i}")
            e_i = h.fwd(self._lift_signed(errors[i], full))
            term = h.engine.mul(s2_ntt_full, factors[i], h.q, h.mu)
            b_i = h.add(h.sub(h.neg(h.pointwise_mul(a_i, self.s_ntt_full)), e_i),
                        term)
            ksk_b[i], ksk_a[i] = b_i, a_i
        return ksk_b, ksk_a

    def _build_keys_batch(self, key_ids: Sequence[str]) -> Dict[str, Tuple]:
        """Build a SET of switching keys. np64: host loop. jx32: ONE
        batched device composition — the uniform components are regenerated
        in-jit from their (seed, stream) counters, the error/target
        polynomials are the only host→device bytes, and the key count is
        padded to a power of two so the executable is shared across
        programs with different key sets. Bit-identical to the host path
        (tests/test_bfv.py cross-engine cases)."""
        if not key_ids:
            return {}
        if not self._on_device:
            return {kid: self._make_ksk_host(self._ksk_target_host(kid),
                                            _ksk_stream(kid))
                    for kid in key_ids}
        import jax
        import jax.numpy as jnp
        full, n = self.full, self.params.n
        alpha = self.params.num_ks_digits
        moduli = tuple(self.params.coeff_modulus)
        K = len(key_ids)
        K_pad = max(2, 1 << (K - 1).bit_length())     # pow2 bucket
        streams = [_ksk_stream(kid) for kid in key_ids]
        streams += [f"pad/{i}" for i in range(K_pad - K)]
        k0s = np.zeros((K_pad, alpha), dtype=np.uint32)
        k1s = np.zeros((K_pad, alpha), dtype=np.uint32)
        for j, stream in enumerate(streams):
            for i in range(alpha):
                k0s[j, i], k1s[j, i] = derive_key(self._prng_seed,
                                                  f"{stream}/d{i}")
        # errors as int8 (|e| ≤ 19): 4× fewer host→device bytes than i32
        errors = np.zeros((K_pad, alpha, n), dtype=np.int8)
        for j, stream in enumerate(streams[:K]):
            errors[j] = self._ksk_errors(stream).astype(np.int8)
        # Target secrets are computed ON DEVICE from the resident
        # s_ntt_full: s² for relin (one pointwise mul), τ_g(s) via the
        # evaluation-domain permutation for galois keys — the permutation
        # INDICES [K_pad, n] int32 (~1 MB) replace the old s2_all payload
        # ([K_pad, full, n] ≈ 15.7 MB at n=16384, the dominant and most
        # jitter-prone term of t_keygen on the 30-200 MB/s tunnel).
        perms = np.zeros((K_pad, n), dtype=np.int32)
        is_relin = np.zeros((K_pad, 1, 1), dtype=bool)
        identity = np.arange(n, dtype=np.int32)
        for j, kid in enumerate(key_ids):
            if kid == "relin":
                is_relin[j] = True
                perms[j] = identity
            else:
                g = int(kid[len("galois_"):])
                perms[j] = self._galois_perm_eval(g).astype(np.int32)
        # ONE batched transfer for all host operands: separate jnp.asarray
        # calls cost a full tunnel round trip each (~10-25 ms)
        k0d, k1d, e_dev, perm_dev, rel_dev = jax.device_put(
            (k0s, k1s, errors, perms, is_relin))
        outs = _ksk_batch_jit(moduli, K_pad)(
            k0d, k1d, e_dev, perm_dev, rel_dev, self._dev_s_ntt_full,
            self._tab["ks_factors"], self._tab["q_full"],
            self._tab["mu_full"], self.ntt_qp.fwd_tw, self.ntt_qp.fwd_tw_sh)
        return {kid: outs[j] for j, kid in enumerate(key_ids)}

    # Key plumbing for whole-program jit (runtime/jit_executor.py): a
    # recording pass collects WHICH keys a program uses; an override dict
    # then feeds them back as jit ARGUMENTS (tracers) so switching keys are
    # executable inputs, not baked trace constants — at n=16384 each key is
    # [α, L+k, 16384]·2 uint32 ≈ 23 MB, and constants both bloat the
    # executable and force a recompile on key rotation.
    def record_key_requests(self, store) -> None:
        """store: a set collecting key ids ("relin" / "galois_<g>"), or None
        to stop recording."""
        self._key_requests = store

    def set_key_overrides(self, overrides) -> None:
        """overrides: {key id: (ksk_b, ksk_a)} whose arrays (possibly
        tracers) are returned by the getters instead of the stored keys."""
        self._key_overrides = overrides

    def materialize_keys(self, key_ids: Sequence[str]) -> Dict[str, Tuple]:
        """Concrete key pairs for a set of recorded key ids, building every
        missing one in a single batched device composition (jx32) or host
        loop (np64); results are cached unless a trace is active."""
        from abc_tpu.utils.tracing import trace_state_clean
        out: Dict[str, Tuple] = {}
        missing = []
        for kid in key_ids:
            cached = self._cached_key(kid)
            if cached is not None:
                out[kid] = cached
            else:
                missing.append(kid)
        built = self._build_keys_batch(missing)
        cache_ok = trace_state_clean()
        for kid, key in built.items():
            out[kid] = key
            if cache_ok:
                if kid == "relin":
                    self.relin_key = key
                else:
                    self.galois_keys[int(kid[len("galois_"):])] = key
        return out

    def _cached_key(self, key_id: str):
        if key_id == "relin":
            return self.relin_key
        return self.galois_keys.get(int(key_id[len("galois_"):]))

    def materialize_key(self, key_id: str) -> Tuple:
        """Concrete arrays for one recorded key id."""
        return self.materialize_keys([key_id])[key_id]

    def _fake_ksk(self) -> Tuple:
        """Shape-correct zero key returned while the jit executor's
        key-RECORDING pass is active: the recording eval_shape only needs
        key ids + shapes to flow, and really building keys inside that
        throwaway trace costs seconds of tracing per key (the real build
        happens once, out-of-trace, in materialize_key)."""
        if not hasattr(self, "_fake_ksk_arr"):
            z = np.zeros((self.params.num_ks_digits, self.full,
                          self.params.n), dtype=np.uint32)
            self._fake_ksk_arr = (z, z)
        return self._fake_ksk_arr

    def get_relin_key(self) -> Tuple:
        req = getattr(self, "_key_requests", None)
        if req is not None:
            req.add("relin")
            return self._fake_ksk()
        ov = getattr(self, "_key_overrides", None)
        if ov and "relin" in ov:
            return ov["relin"]
        return self.materialize_keys(["relin"])["relin"]

    def get_galois_key(self, galois_elt: int) -> Tuple:
        req = getattr(self, "_key_requests", None)
        if req is not None:
            req.add(f"galois_{galois_elt}")
            return self._fake_ksk()
        ov = getattr(self, "_key_overrides", None)
        if ov and f"galois_{galois_elt}" in ov:
            return ov[f"galois_{galois_elt}"]
        kid = f"galois_{galois_elt}"
        return self.materialize_keys([kid])[kid]

    # ----------------------------------------------------------------- encoding
    @staticmethod
    def _build_slot_map(n: int) -> np.ndarray:
        """slot index → NTT-output position, per the SEAL-compatible 2×(n/2)
        matrix batching layout: slot (r, i) sits at evaluation point
        ψ^(±3^i mod 2n); forward-NTT position p evaluates at ψ^(2·brv(p)+1)
        (convention verified in tests/test_ntt.py)."""
        if n in _SLOT_MAP_CACHE:      # pure function of n; ~9 ms to build
            return _SLOT_MAP_CACHE[n]
        from abc_tpu.crypto.ntt import _bit_reverse_vec
        logn = n.bit_length() - 1
        m = 2 * n
        brv = _bit_reverse_vec(n, logn)  # table lookup beats 16384 int loops
        pos = np.empty(n, dtype=np.int64)
        g = 1
        for i in range(n // 2):
            pos[i] = brv[(g - 1) // 2]            # row 0: exponent 3^i
            pos[n // 2 + i] = brv[(m - g - 1) // 2]   # row 1: exponent -3^i
            g = g * 3 % m
        _SLOT_MAP_CACHE[n] = pos
        return pos

    def encode(self, values: Sequence[int]) -> Plaintext:
        """Batch-encode up to n integers into slots (zero-padded here;
        last-element padding is applied by the runtime factory layer)."""
        n, t = self.params.n, self.params.plain_modulus
        if len(values) > n:
            raise RuntimeExecutionError(f"too many values to encode: {len(values)}")
        slots = np.zeros(n, dtype=np.uint32)
        if len(values):
            vals = np.asarray([int(v) % t for v in values], dtype=np.uint32)
            slots[self._slot_to_pos[:len(vals)]] = vals
        coeffs = self.ntt_t.inv(slots.reshape(1, n))[0]
        return Plaintext(coeffs)

    def decode(self, pt: Plaintext, signed: bool = True) -> List[int]:
        n, t = self.params.n, self.params.plain_modulus
        slots_eval = self.ntt_t.fwd(pt.coeffs.reshape(1, n))[0]
        out = slots_eval[self._slot_to_pos].astype(np.int64)
        if signed:   # vectorized centered(): a Python loop costs ~10 ms at
            out = np.where(out > t // 2, out - t, out)   # n=16384
        return out.tolist()

    # ----------------------------------------------------------------- encrypt
    def encrypt(self, pt: Plaintext) -> BfvCiphertext:
        return self.encrypt_many([pt])[0]

    def encrypt_many(self, pts: Sequence[Plaintext]) -> List[BfvCiphertext]:
        """Encrypt a batch. Host path loops; the jx32 path runs ONE jitted
        device call over the whole [B, ...] batch (encryption is
        embarrassingly parallel: a batched NTT + pointwise), with only the
        n-sized secret samples crossing to the device — the round-2 bench
        lost 28× to the reference on t_input_encryption by doing per-ct
        host NTTs + full-ciphertext transfers."""
        if not pts:
            return []
        samples = []
        for _ in pts:   # rng draw order per ct: u, e0, e1 (both engines)
            samples.append((self._sample_ternary(), self._sample_error(),
                            self._sample_error()))
        if self._on_device:
            return self._encrypt_many_device(pts, samples)
        return [self._encrypt_host(pt, *s) for pt, s in zip(pts, samples)]

    def _encrypt_host(self, pt: Plaintext, u, e0s, e1s) -> BfvCiphertext:
        h = self.hq
        L = self.params.L
        u_ntt = h.fwd(self._lift_signed(u, L))
        e0 = self._lift_signed(e0s, L)
        e1 = self._lift_signed(e1s, L)
        c0 = h.engine.add(h.inv(h.pointwise_mul(self.pk_b_ntt, u_ntt)), e0, h.q)
        c1 = h.engine.add(h.inv(h.pointwise_mul(self.pk_a_ntt, u_ntt)), e1, h.q)
        dm = h.engine.mul(self._lift_plain_host(pt),
                          self._host["delta_mod_q"], h.q, h.mu)
        c0 = h.engine.add(c0, dm, h.q)
        return BfvCiphertext(np.stack([c0, c1]))

    def _encrypt_many_device(self, pts, samples) -> List[BfvCiphertext]:
        """One module-level jitted device call for the whole batch. The
        batch is PADDED to a multiple of 16 (with zero samples, drawn from
        no generator): batch-1 shapes measured pathological XLA compiles
        (36-380 s on this rig), B=16 compiles in ~2 s, and the bucketing
        keeps one executable shared across programs with different input
        counts. Padding lanes are discarded."""
        import jax.numpy as jnp
        from abc_tpu.utils.tracing import trace_state_clean
        B = len(pts)
        # pad only for EAGER calls (compile-shape bucketing); inside a
        # trace the encryption is inlined into the surrounding program and
        # padded lanes would be computed in its hot path every run
        B_pad = max(16, -(-B // 16) * 16) if trace_state_clean() else B
        n = self.params.n

        def pad(arr):
            out = np.zeros((B_pad,) + arr.shape[1:], dtype=arr.dtype)
            out[:B] = arr
            return out

        m = pad(np.stack([pt.coeffs for pt in pts]).astype(np.uint32))
        u = pad(np.stack([s[0] for s in samples]).astype(np.int32))
        e0 = pad(np.stack([s[1] for s in samples]).astype(np.int32))
        e1 = pad(np.stack([s[2] for s in samples]).astype(np.int32))
        ntt = self.ntt_q
        out = _enc_jit()(
            jnp.asarray(m), jnp.asarray(u), jnp.asarray(e0),
            jnp.asarray(e1), self._dev_pk_b, self._dev_pk_a,
            self.q_q, self.mu_q, self._tab["delta_mod_q"],
            ntt.fwd_tw, ntt.fwd_tw_sh, ntt.inv_tw, ntt.inv_tw_sh,
            ntt.n_inv, ntt.n_inv_sh)
        return [BfvCiphertext(out[i]) for i in range(B)]

    def _lift_plain_host(self, pt: Plaintext) -> np.ndarray:
        # plaintext coefficients are < t < every q_j: no reduction needed
        return np.broadcast_to(pt.coeffs,
                               (self.params.L, self.params.n)).copy()

    # ----------------------------------------------------------------- decrypt
    def _crt_compose_host(self, v: np.ndarray) -> np.ndarray:
        """[L, n] residues → object array of exact bigints in [0, q)."""
        qs = self.params.data_primes
        q_big = self.params.q
        acc = np.zeros(self.params.n, dtype=object)
        for l, ql in enumerate(qs):
            qhat = q_big // ql
            c = qhat * modinv(qhat % ql, ql)
            acc = (acc + v[l].astype(object) * c) % q_big
        return acc

    def decrypt(self, ct: BfvCiphertext) -> Plaintext:
        """Fast vectorized CRT scale-and-round (see table notes in __init__);
        exact-bigint fallback when a coefficient sits at the rounding
        boundary (noise at capacity). jx32 contexts run the dot product AND
        the scale-and-round on device (one jitted call) so only the [n]
        plaintext coefficients cross the device boundary."""
        if self._on_device:
            return self._decrypt_device(ct)
        v = self._dot_secret(ct)
        L = self.params.L
        t = self.params.plain_modulus
        qs64 = np.asarray(self.params.data_primes, dtype=np.uint64
                          ).reshape(L, 1)
        y = v.astype(np.uint64) * self._dec_qhat_inv % qs64
        total = (y.astype(np.float64) * self._dec_t_over_q).sum(axis=0)
        r = np.rint(total)
        if np.max(np.abs(total - r)) < 0.499:
            coeffs = (r.astype(np.int64) % t).astype(np.uint32)
            return Plaintext(coeffs)
        return self._decrypt_exact(v)[0]

    def _decrypt_device(self, ct: BfvCiphertext) -> Plaintext:
        import jax
        import jax.numpy as jnp
        ntt = self.ntt_q
        data = ct.data if not isinstance(ct.data, np.ndarray) \
            else jnp.asarray(ct.data)
        s_ntt_L = getattr(self, "_dev_s_ntt_L", None)
        if s_ntt_L is None:                  # restored contexts, older paths
            s_ntt_L = self._dev_s_ntt_full[:self.params.L]
        packed, v = _dec_jit(self.params.plain_modulus, self._dec_mu_t)(
            data, s_ntt_L, self.q_q, self.mu_q,
            self._tab["dec_qinv"], self._tab["dec_qinv_sh"],
            self._tab["dec_f_hi"], self._tab["dec_f_lo"],
            ntt.fwd_tw, ntt.fwd_tw_sh, ntt.inv_tw, ntt.inv_tw_sh,
            ntt.n_inv, ntt.n_inv_sh)
        # ONE host pull of ONE buffer (coefficients ‖ boundary flag); v
        # stays on device unless the flag forces the exact fallback
        host = jax.device_get(packed)
        if bool(host[-1]):            # noise at capacity: exact bigints
            return self._decrypt_exact(np.asarray(v))[0]
        return Plaintext(host[:-1])

    def _dot_secret(self, ct: BfvCiphertext) -> np.ndarray:
        """v = Σ_k c_k·s^k mod q, [L, n] coefficient-domain residues
        (supports size-3 pre-relin ciphertexts)."""
        h = self.hq
        L = self.params.L
        data = np.asarray(ct.data).astype(np.uint32)
        s_pow = None
        v_ntt = h.fwd(data[0])
        for k in range(1, ct.size):
            s_pow = self.s_ntt_full[:L] if s_pow is None else \
                h.pointwise_mul(s_pow, self.s_ntt_full[:L])
            v_ntt = h.add(v_ntt, h.pointwise_mul(h.fwd(data[k]), s_pow))
        return h.inv(v_ntt)

    def _decrypt_full(self, ct: BfvCiphertext) -> Tuple[Plaintext, int]:
        """Returns (plaintext, invariant-noise budget in bits) — exact."""
        return self._decrypt_exact(self._dot_secret(ct))

    def _decrypt_exact(self, v: np.ndarray) -> Tuple[Plaintext, int]:
        q_big, t = self.params.q, self.params.plain_modulus
        big = self._crt_compose_host(v)
        coeffs = np.zeros(self.params.n, dtype=np.uint32)
        max_resid = 0
        for j in range(self.params.n):
            r = int(big[j]) * t
            m_j, resid = divmod(r, q_big)
            if resid > q_big // 2:
                m_j += 1
                resid -= q_big
            coeffs[j] = m_j % t
            if abs(resid) > max_resid:
                max_resid = abs(resid)
        if max_resid == 0:
            budget = q_big.bit_length()
        else:
            budget = max(0, q_big.bit_length() - 1 - max_resid.bit_length())
        return Plaintext(coeffs), budget

    def noise_budget(self, ct: BfvCiphertext) -> int:
        """Invariant-noise budget in bits (ref: SealCiphertext::noiseBits,
        SealCiphertext.cpp:80-83)."""
        return self._decrypt_full(ct)[1]

    # ------------------------------------------------------------ homomorphic ops
    def _dbg_check(self, ct: BfvCiphertext) -> BfvCiphertext:
        """Limb-consistency invariant check (debug mode, SURVEY.md §5):
        every residue must sit in [0, q_l). Enable with
        ABC_TPU_DEBUG_CHECKS=1; host (numpy) data only — traced arrays
        cannot be inspected."""
        import os
        if os.environ.get("ABC_TPU_DEBUG_CHECKS") and \
                isinstance(ct.data, np.ndarray):
            q = np.asarray(self._host["q_full"][:self.params.L])
            if not (ct.data < q).all():
                raise RuntimeExecutionError(
                    "limb-consistency violation: residue >= q_l")
        return ct

    def add(self, a: BfvCiphertext, b: BfvCiphertext) -> BfvCiphertext:
        return self._dbg_check(
            BfvCiphertext(self.engine.add(a.data, b.data, self.q_q)))

    def sub(self, a: BfvCiphertext, b: BfvCiphertext) -> BfvCiphertext:
        return BfvCiphertext(self.engine.sub(a.data, b.data, self.q_q))

    def negate(self, a: BfvCiphertext) -> BfvCiphertext:
        return BfvCiphertext(self.engine.neg(a.data, self.q_q))

    def _plain_dm(self, pt: Plaintext):
        """Δ·m in RNS on the evaluation device, [L, n]."""
        m = self._dev(self._lift_plain_host(pt))
        return self.engine.mul(m, self._tab["delta_mod_q"], self.q_q, self.mu_q)

    def add_plain(self, a: BfvCiphertext, pt: Plaintext) -> BfvCiphertext:
        c0 = self.engine.add(a.data[0], self._plain_dm(pt), self.q_q)
        return BfvCiphertext(_set0(a.data, c0))

    def sub_plain(self, a: BfvCiphertext, pt: Plaintext) -> BfvCiphertext:
        c0 = self.engine.sub(a.data[0], self._plain_dm(pt), self.q_q)
        return BfvCiphertext(_set0(a.data, c0))

    def sub_from_plain(self, a: BfvCiphertext, pt: Plaintext) -> BfvCiphertext:
        """Δ·m − ct (plain minus ciphertext, non-commutative case)."""
        neg = self.engine.neg(a.data, self.q_q)
        c0 = self.engine.add(neg[0], self._plain_dm(pt), self.q_q)
        return BfvCiphertext(_set0(neg, c0))

    def multiply_plain(self, a: BfvCiphertext, pt: Plaintext) -> BfvCiphertext:
        m_ntt = self.ntt_q.fwd(self._dev(self._lift_plain_host(pt)))
        ck = self.ntt_q.fwd(a.data)                     # batch over k
        prod = self.engine.mul(ck, m_ntt, self.q_q, self.mu_q)
        return BfvCiphertext(self.ntt_q.inv(prod))

    def multiply(self, a: BfvCiphertext, b: BfvCiphertext,
                 relinearize: bool = True, a_pre=None, b_pre=None
                 ) -> BfvCiphertext:
        """ct·ct multiply via BEHZ full-RNS (crypto/behz.py), then
        relinearization — the op that dominates the reference's cycles
        (SealCiphertext.cpp:121-124: multiply_inplace + relinearize_inplace).
        a_pre/b_pre: optional precompute_mult_operand results, hoisting the
        per-operand lift+NTT for operands reused across multiplies."""
        behz = self._get_behz()
        if a.size != 2 or b.size != 2:
            raise RuntimeExecutionError("multiply expects size-2 ciphertexts")
        self.counters["mult"] += 1
        if a_pre is None:
            a_pre = self._operand_cached(a.data)
        if b_pre is None:
            b_pre = a_pre if b.data is a.data else \
                self._operand_cached(b.data)
        ct3 = BfvCiphertext(behz.multiply(a.data, b.data,
                                          pre1=a_pre, pre2=b_pre))
        return self._dbg_check(self.relinearize(ct3) if relinearize else ct3)

    def _operand_cached(self, ct_data):
        """Operand-NTT forms with an identity-keyed cache: a ciphertext
        multiplied repeatedly (fixed multiplier in a chain, shared factor
        in a product tree, squaring) lifts+transforms once — the operand
        half of SEAL's transform_to_ntt, applied TRANSPARENTLY (same
        pattern as _decompose_cached for rotations). Each hit skips
        2·(2L+2) NTT rows + the Bsk lift."""
        from abc_tpu.utils.tracing import trace_token
        cache = getattr(self, "_op_cache", None)
        if cache is None:
            from collections import OrderedDict
            cache = self._op_cache = OrderedDict()
        tok = trace_token()
        key = id(ct_data)
        hit = cache.get(key)
        # the trace-token check prevents serving a value computed in one
        # trace to another: a CONCRETE ciphertext (closure constant) used
        # in two separately-jitted programs keeps its id, but the cached
        # NTT forms from trace A are tracers that must not leak into B
        if hit is not None and hit[0] is ct_data and hit[2] == tok:
            cache.move_to_end(key)
            self.counters["op_ntt_hit"] += 1
            return hit[1]
        self.counters["op_ntt"] += 1
        pre = self._get_behz().precompute_operand(ct_data)
        cache[key] = (ct_data, pre, tok)
        while len(cache) > 8:
            cache.popitem(last=False)
        return pre

    def precompute_mult_operand(self, a: BfvCiphertext):
        """Hoistable per-operand half of `multiply` (NTT forms over q and
        Bsk) — SEAL transform_to_ntt analogue for a reused multiplier."""
        return self._get_behz().precompute_operand(a.data)

    def square(self, a: BfvCiphertext, relinearize: bool = True) -> BfvCiphertext:
        return self.multiply(a, a, relinearize=relinearize)

    def relinearize(self, ct: BfvCiphertext) -> BfvCiphertext:
        """Size-3 → size-2 via key switching of the s² component."""
        if ct.size == 2:
            return ct
        if ct.size != 3:
            raise RuntimeExecutionError(f"cannot relinearize size-{ct.size}")
        self.counters["relin"] += 1
        k0, k1 = self._key_switch(ct.data[2], self.get_relin_key())
        xp = _xp(ct.data)
        c0 = self.engine.add(ct.data[0], k0, self.q_q)
        c1 = self.engine.add(ct.data[1], k1, self.q_q)
        return BfvCiphertext(xp.stack([c0, c1]))

    # ------------------------------------------------------------- key switching
    # --------------------------------------------- mesh (limb-sharded) mode
    #
    # When executing inside a shard_map kernel over a mesh with a "limb"
    # axis (runtime/jit_executor.py mesh mode), the key-switch
    # decomposition contraction Σ_i D_i ⊙ ksk_i is sharded across that
    # axis: each device decomposes + NTTs only its α/limb digit slice
    # against its local switching-key shard, and one modular psum over ICI
    # combines the [L+k, n] accumulators (same math as
    # parallel/sharding.py:sharded_key_switch, applied transparently to
    # EVERY key switch the compiled program performs — relinearization,
    # rotations, hoisted rotations).

    _limb_axis: Optional[str] = None      # mesh axis name, set in-kernel
    _limb_size: int = 1

    def set_limb_sharding(self, axis_name: Optional[str], size: int = 1):
        """Enable/disable limb-sharded key switching. Call ONLY inside a
        shard_map kernel body whose mesh has `axis_name`; requires
        ks_digits == 1 (per-limb digits) and size | L."""
        if axis_name is not None:
            if self.params.ks_digits != 1:
                raise RuntimeExecutionError(
                    "limb-sharded execution implements the ks_digits=1 "
                    "layout; build the context with ks_digits=1")
            if self.params.L % size:
                raise RuntimeExecutionError(
                    f"limb mesh axis ({size}) must divide L "
                    f"({self.params.L})")
        self._limb_axis = axis_name
        self._limb_size = size if axis_name is not None else 1

    def _decompose_ntt(self, d):
        """RNS-decompose d ([L, n] coeff domain over q) into α hybrid digits
        and lift each to the full base q∪P in NTT domain: D [α, L+k, n].
        This is the EXPENSIVE half of a key switch (α·(L+k) forward NTTs) —
        hoisted_rotations computes it once and reuses it across many Galois
        elements. In limb-sharded mode only THIS device's α/limb digit
        slice is decomposed (D [α/limb, L+k, n])."""
        L, full, n = self.params.L, self.full, self.params.n
        k, alpha = self.params.ks_digits, self.params.num_ks_digits
        xp = _xp(d)
        q_full = self._tab["q_full"].reshape(1, full, 1)
        if self._limb_axis is not None:
            import jax
            Lk = L // self._limb_size
            i = jax.lax.axis_index(self._limb_axis)
            d_loc = jax.lax.dynamic_slice_in_dim(d, i * Lk, Lk, axis=0)
            lifted = xp.broadcast_to(d_loc[:, None, :], (Lk, full, n))
            lifted = xp.where(lifted >= q_full, lifted - q_full, lifted)
            return self.ntt_qp.fwd(lifted)
        if k == 1:
            # single-limb digits: the lift is a conditional subtract
            # (uniform 30-bit primes), no multiplies needed
            lifted = xp.broadcast_to(d[:, None, :], (L, full, n))
            lifted = xp.where(lifted >= q_full, lifted - q_full, lifted)
            return self.ntt_qp.fwd(lifted)
        # k ≥ 2: fast base conversion of each digit [d]_{Q_j} to q∪P
        mu_full = self._tab["mu_full"].reshape(1, full, 1)
        y_src = d[self._dec_gather.reshape(-1)].reshape(alpha, k, n)
        y = self.engine.mul(y_src, self._tab["dec_inv_qhat"],
                            self._tab["dec_q_src"], self._tab["dec_mu_src"])
        D = None
        for i in range(k):
            term = self.engine.mul(
                xp.broadcast_to(y[:, i:i + 1, :], (alpha, full, n)),
                self._tab["dec_qhat_full"][:, i], q_full, mu_full)
            D = term if D is None else self.engine.add(D, term, q_full)
        return self.ntt_qp.fwd(D)

    def _ks_inner(self, D, ksk_b, ksk_a) -> Tuple:
        """Inner product of a decomposition D with a switching key, then
        mod-switch down: the CHEAP half of a key switch."""
        full = self.full
        q_full = self._tab["q_full"].reshape(1, full, 1)
        mu_full = self._tab["mu_full"].reshape(1, full, 1)
        tb = self.engine.mul(D, ksk_b, q_full, mu_full)
        ta = self.engine.mul(D, ksk_a, q_full, mu_full)
        acc_b = _acc_mod(tb, self._tab["q_full"], self.engine)
        acc_a = _acc_mod(ta, self._tab["q_full"], self.engine)
        if self._limb_axis is not None:
            # combine the per-device partial contractions over ICI
            from abc_tpu.parallel.sharding import _psum_mod
            acc_b = _psum_mod(acc_b, self._tab["q_full"],
                              self._tab["mu_full"], self._limb_axis,
                              self.engine)
            acc_a = _psum_mod(acc_a, self._tab["q_full"],
                              self._tab["mu_full"], self._limb_axis,
                              self.engine)
        # one batched inverse transform (B=2) — separate calls amortize the
        # per-limb twiddle table loads half as well
        acc = self.ntt_qp.inv(_xp(D).stack([acc_b, acc_a]))
        return self._mod_switch_down(acc[0]), self._mod_switch_down(acc[1])

    def _ksk_device(self, ksk) -> Tuple:
        """Device copies of a (host-numpy, trace-safe) switching key, cached
        trace-aware (see note below)."""
        ksk_b, ksk_a = ksk
        ck = id(ksk_b)
        cache = getattr(self, "_ksk_dev_cache", None)
        if cache is None:
            cache = self._ksk_dev_cache = {}
        hit = cache.get(ck)
        if hit is not None and hit[0] is ksk_b:   # ids recycle: verify
            return hit[1]
        dev = (self._dev(ksk_b), self._dev(ksk_a))
        from abc_tpu.utils.tracing import trace_state_clean
        if trace_state_clean():            # in-trace values are tracers
            cache[ck] = (ksk_b, dev)
        return dev

    def _key_switch(self, d, ksk) -> Tuple:
        """d: [L, n] coeff-domain poly over q → (k0, k1) over q with
        k0 + k1·s ≈ d·s2 (both coeff domain)."""
        ksk_b, ksk_a = self._ksk_device(ksk)
        return self._ks_inner(self._decompose_ntt(d), ksk_b, ksk_a)

    def _mod_switch_down(self, x):
        """[L+k, n] over q∪P → [L, n] over q: k successive exact centered
        divisions (x − centered([x]_{p_s}))·p_s^{-1}, last special first."""
        L, k = self.params.L, self.params.ks_digits
        xp = _xp(x)
        for s in reversed(range(k)):
            rest = L + s
            x_rest, x_p = x[:rest], x[rest]
            qv = self._tab["q_full"][:rest]
            muv = self._tab["mu_full"][:rest]
            x_p_red = xp.where(x_p >= qv, x_p - qv, x_p)  # uniform prime sizes
            over_half = x_p > xp.uint32(self._msd_half[s])
            corr = xp.where(over_half,
                            self.engine.sub(x_p_red,
                                            self._tab[f"msd_p_mod_{s}"], qv),
                            x_p_red)
            diff = self.engine.sub(x_rest, corr, qv)
            x = self.engine.mul(diff, self._tab[f"msd_p_inv_{s}"], qv, muv)
        return x

    # ------------------------------------------------------------------ rotations
    def _galois_perm_host(self, g: int) -> Tuple[np.ndarray, np.ndarray]:
        """Gather indices + signs applying x → x^g in coefficient domain
        (vectorized: the former per-index Python loop cost ~30 ms per galois
        element at n=16384)."""
        n = self.params.n
        j = np.arange(n, dtype=np.int64)
        jg = (j * g) % (2 * n)
        wrap = jg >= n
        idx = np.where(wrap, jg - n, jg)
        gather = np.empty(n, dtype=np.int64)
        sign_pos = np.empty(n, dtype=bool)
        gather[idx] = j
        sign_pos[idx] = ~wrap
        return gather, sign_pos

    def _apply_automorphism_host(self, poly: np.ndarray, gather, sign_pos):
        out = poly[..., gather]
        q = np.asarray(self.hqp.q)[:poly.shape[-2]]
        neg = np.where(out == 0, 0, q - out.astype(np.uint64)).astype(np.uint32)
        return np.where(sign_pos, out, neg)

    def _galois_perm(self, g: int):
        if g not in self._perm_cache:
            # host numpy (trace-safe; see _make_ksk note)
            self._perm_cache[g] = self._galois_perm_host(g)
        return self._perm_cache[g]

    def _decompose_cached(self, ct_data):
        """Key-switch decomposition of ct_data[1] with a small
        identity-keyed cache: repeated rotations of the SAME ciphertext
        (kernel stencils, BSGS matvec, rotate-reduce fan-outs) share the
        expensive α·(L+k) forward NTTs — HElib/SEAL-style hoisting applied
        TRANSPARENTLY by every rotation instead of only via the explicit
        hoisted_rotations API. Identity is verified with `is` (ids recycle);
        entries are capped; tracer entries from finished traces can never
        false-hit (a later trace's tracers are different objects)."""
        from abc_tpu.utils.tracing import trace_token
        cache = getattr(self, "_dec_cache", None)
        if cache is None:
            from collections import OrderedDict
            cache = self._dec_cache = OrderedDict()
        tok = trace_token()   # entries from one trace must not serve another
        key = id(ct_data)
        hit = cache.get(key)
        if hit is not None and hit[0] is ct_data and hit[2] == tok:
            cache.move_to_end(key)
            self.counters["decomp_hit"] += 1
            return hit[1]
        self.counters["decomp"] += 1
        D = self._decompose_ntt(ct_data[1])
        cache[key] = (ct_data, D, tok)
        while len(cache) > 8:
            cache.popitem(last=False)
        return D

    def apply_galois(self, ct: BfvCiphertext, g: int) -> BfvCiphertext:
        """Galois automorphism + key switch, in the HOISTED formulation:
        decompose-NTT the untouched c1 (cacheable across rotations of the
        same ct, _decompose_cached), permute the decomposition in the NTT
        domain (exact — no signs there, _galois_perm_eval), then the cheap
        inner-product half. Equivalent to permute-then-switch up to the
        key-switch rounding term; decrypts identically (tests/test_linalg)."""
        if ct.size != 2:
            raise RuntimeExecutionError("relinearize before applying Galois")
        self.counters["galois"] += 1
        xp = _xp(ct.data)
        D = self._decompose_cached(ct.data)
        perm = self._galois_perm_eval(g)
        ksk_b, ksk_a = self._ksk_device(self.get_galois_key(g))
        k0, k1 = self._ks_inner(D[..., perm], ksk_b, ksk_a)
        gather, sign_pos = self._galois_perm(g)
        c0g = ct.data[0][..., gather]
        c0g = xp.where(sign_pos, c0g, self.engine.neg(c0g, self.q_q))
        c0 = self.engine.add(c0g, k0, self.q_q)
        return self._dbg_check(BfvCiphertext(xp.stack([c0, k1])))

    def _galois_perm_eval(self, g: int) -> np.ndarray:
        """Gather indices applying x → x^g in the NTT (evaluation) domain:
        position p holds the eval at ψ^{e_p}, e_p = 2·brv(p)+1, and the
        automorphism is the PURE permutation out[p] = in[pos(e_p·g mod 2n)]
        — no signs (signs only arise in coefficient order). This is what
        makes hoisting work: the decomposition can be permuted AFTER its
        (expensive) forward NTTs."""
        key = ("eval", g)
        if key not in self._perm_cache:
            from abc_tpu.crypto.ntt import eval_perm_tables
            n = self.params.n
            e, pos_of_exp = eval_perm_tables(n)      # module-cached per n
            self._perm_cache[key] = pos_of_exp[(e * g) % (2 * n)]
        return self._perm_cache[key]

    def hoisted_rotations(self, ct: BfvCiphertext,
                          steps_list: Sequence[int]) -> List[BfvCiphertext]:
        """Rotate ONE ciphertext by MANY step counts, sharing the key-switch
        decomposition (HElib/SEAL-style hoisting; the Vectorizer design's
        "rotation re-use", reference Vectorizer.h:60-98). The L·(L+1)
        forward NTTs of the decomposition run once; each rotation then costs
        only a permutation + inner product + inverse NTTs — ~3-4× cheaper
        per additional rotation. Used by baby-step/giant-step matvec."""
        if ct.size != 2:
            raise RuntimeExecutionError("relinearize before rotating")
        n = self.params.n
        xp = _xp(ct.data)
        D = self._decompose_cached(ct.data)           # hoisted: once
        out = []
        for steps in steps_list:
            s = steps % (n // 2)
            if s == 0:
                out.append(BfvCiphertext(ct.data))
                continue
            g = pow(3, s, 2 * n)
            self.counters["galois"] += 1
            perm = self._galois_perm_eval(g)
            ksk_b, ksk_a = self._ksk_device(self.get_galois_key(g))
            k0, k1 = self._ks_inner(D[..., perm], ksk_b, ksk_a)
            gather, sign_pos = self._galois_perm(g)   # coeff-domain for c0
            c0g = ct.data[0][..., gather]
            c0g = xp.where(sign_pos, c0g, self.engine.neg(c0g, self.q_q))
            out.append(BfvCiphertext(xp.stack([self.engine.add(c0g, k0,
                                                               self.q_q),
                                               k1])))
        return out

    def rotate_rows(self, ct: BfvCiphertext, steps: int) -> BfvCiphertext:
        """Rotate each batching row by `steps` (positive = left), matching
        SEAL::rotate_rows (expected vectors, RuntimeVisitorTest.cpp:100-103)."""
        n = self.params.n
        steps = steps % (n // 2)
        if steps == 0:
            return ct
        g = pow(3, steps, 2 * n)
        return self.apply_galois(ct, g)

    def rotate_columns(self, ct: BfvCiphertext) -> BfvCiphertext:
        """Swap the two batching rows (galois element 2n−1)."""
        return self.apply_galois(ct, 2 * self.params.n - 1)


# ----------------------------------------------------- module-level device jits
#
# The jx32 host-boundary builders (encrypt / decrypt / switching keys) are
# MODULE-LEVEL jitted functions taking every table as an ARGUMENT: all
# contexts with matching shapes share one compiled executable per shape.
# Per-context jit closures would retrace AND recompile for every context —
# and on the axon-tunneled TPU a fresh XLA compile costs seconds to minutes
# with an unreliable cross-process cache. They use the pure-XLA stage-loop
# NTT (_fwd_stages/_inv_stages — no Mosaic compile), bit-identical to the
# Pallas hot path.

_MJIT: Dict = {}


def _mjit(key, make_fn):
    if key not in _MJIT:
        import jax
        _MJIT[key] = jax.jit(make_fn())
    return _MJIT[key]


def _ksk_stream(key_id: str) -> str:
    """Key id → PRNG stream label (identical for both engines)."""
    return key_id          # "relin" / "galois_<g>"


def _lift_signed_u32(v_i32, q_col):
    """[..., n] int32 signed coeffs → [..., L, n] uint32 residues (device).
    Two's-complement wrap makes q + v ≡ q − |v| (mod 2^32)."""
    import jax.numpy as jnp
    v_u = v_i32.astype(jnp.uint32)[..., None, :]
    neg = (v_i32 < 0)[..., None, :]
    return jnp.where(neg, q_col + v_u, v_u)


def _keygen_dev_jit(moduli_L: Tuple[int, ...]):
    """Device-side public-key build (round 5): transfers only the [n] int8
    secret and error samples (~32 KB at n=16384); the uniform `a`
    regenerates from its PRNG key words in-jit and all NTTs run on device.
    Replaces the ~1.3-2.6 MB host→device key transfer that made
    factory_ctor ~45 ms of t_keygen on the tunneled rig. Outputs are
    BIT-IDENTICAL to the host keygen (same PRNG streams, same NTT).

    Returns (s_ntt_full [full, n], pk_b [L, n], pk_a [L, n],
    s_ntt_L [L, n] — the pre-sliced decrypt view)."""
    def make():
        def build(s_i8, e_i8, k0, k1, q_full, mu_full, fwd_qp, fwd_qp_sh,
                  q_L, mu_L, fwd_q, fwd_q_sh):
            import jax.numpy as jnp
            from abc_tpu.crypto.ntt import _fwd_stages
            from abc_tpu.crypto.prng import uniform_rns_jx_keys
            from abc_tpu.ops.modarith import jx32 as e
            L = len(moduli_L)
            s_full = _lift_signed_u32(s_i8.astype(jnp.int32), q_full)
            s_ntt_full = _fwd_stages(e, s_full, fwd_qp, fwd_qp_sh, q_full)
            a = uniform_rns_jx_keys(k0, k1, list(moduli_L), s_i8.shape[-1])
            e_lift = _lift_signed_u32(e_i8.astype(jnp.int32), q_L)
            e_ntt = _fwd_stages(e, e_lift, fwd_q, fwd_q_sh, q_L)
            s_L = s_ntt_full[:L]
            as_ntt = e.mul(a, s_L, q_L, mu_L)
            pk_b = e.sub(e.neg(as_ntt, q_L), e_ntt, q_L)
            return s_ntt_full, pk_b, a, s_L
        return build
    return _mjit(("keygen", moduli_L), make)


def _ksk_batch_jit(moduli: Tuple[int, ...], K_pad: int):
    """Batched switching-key builder over K_pad padded keys (see
    BfvContext._build_keys_batch); keyed by the modulus chain + bucket.

    Returns one (b, a) PAIR PER KEY from the single jitted call — the
    per-key split is a fused in-trace slice, so consumers get individual
    device arrays without post-hoc eager b[j]/a[j] slicing (each of those
    was a separate ~25 ms dispatch on the tunneled TPU: 2K slices for a
    10-key program cost ~500 ms of the measured t_keygen)."""
    def make():
        def build(k0s, k1s, e_i8, perms, is_relin, s_ntt, factors, q_full,
                  mu_full, fwd_tw, fwd_tw_sh):
            import jax.numpy as jnp
            from abc_tpu.crypto.ntt import _fwd_stages
            from abc_tpu.crypto.prng import uniform_rns_jx_keys
            from abc_tpu.ops.modarith import jx32 as e
            n = e_i8.shape[-1]
            q = q_full.reshape(1, 1, -1, 1)
            mu = mu_full.reshape(1, 1, -1, 1)
            a = uniform_rns_jx_keys(k0s, k1s, moduli, n)   # [K, α, full, n]
            e_lift = _lift_signed_u32(e_i8.astype(jnp.int32), q_full)
            e_ntt = _fwd_stages(e, e_lift, fwd_tw, fwd_tw_sh, q_full)
            # target secrets in-jit (see _build_keys_batch): s² for relin,
            # τ_g(s) as the eval-domain gather for galois keys
            q2 = q_full.reshape(-1, 1)
            mu2 = mu_full.reshape(-1, 1)
            s2 = e.mul(s_ntt, s_ntt, q2, mu2)              # [full, n]
            tau = jnp.moveaxis(jnp.take(s_ntt, perms, axis=1), 1, 0)
            s2_all = jnp.where(is_relin, s2[None], tau)    # [K, full, n]
            term = e.mul(s2_all[:, None], factors[None], q, mu)
            b = e.add(e.sub(e.neg(e.mul(a, s_ntt[None, None], q, mu), q),
                            e_ntt, q), term, q)
            return tuple((b[j], a[j]) for j in range(K_pad))
        return build
    return _mjit(("ksk", moduli, K_pad), make)


def _enc_jit():
    """Batched public-key encryption (see _encrypt_many_device)."""
    def make():
        def enc(m_u32, u_i32, e0_i32, e1_i32, pk_b, pk_a, q, mu, delta,
                fwd_tw, fwd_tw_sh, inv_tw, inv_tw_sh, n_inv, n_inv_sh):
            import jax.numpy as jnp
            from abc_tpu.crypto.ntt import _fwd_stages, _inv_stages
            from abc_tpu.ops.modarith import jx32 as e
            u_ntt = _fwd_stages(e, _lift_signed_u32(u_i32, q),
                                fwd_tw, fwd_tw_sh, q)      # [B, L, n]
            pre = jnp.stack([e.mul(pk_b[None], u_ntt, q, mu),
                             e.mul(pk_a[None], u_ntt, q, mu)],
                            axis=1)                        # [B, 2, L, n]
            ci = _inv_stages(e, pre, inv_tw, inv_tw_sh, q, n_inv, n_inv_sh)
            dm = e.mul(m_u32[:, None, :], delta, q, mu)
            c0 = e.add(e.add(ci[:, 0], _lift_signed_u32(e0_i32, q), q),
                       dm, q)
            c1 = e.add(ci[:, 1], _lift_signed_u32(e1_i32, q), q)
            return jnp.stack([c0, c1], axis=1)
        return enc
    return _mjit("enc", make)


def _dec_jit(t: int, mu_t: int):
    """Device decryption: c₀+c₁s(+c₂s²) dot product + exact u32 fixed-point
    CRT scale-and-round (θ_l = t/q_l carried as a 64-bit fixed-point pair;
    see the table notes in BfvContext.__init__). Returns (m, at_boundary,
    v) — the boundary flag triggers the host exact-bigint fallback."""
    def make():
        def reduce_t(v, e):         # v < 2^31 → v mod t (t < 2^21)
            import jax.numpy as jnp
            z = e.umulhi(v, jnp.uint32(mu_t))
            r = v - z * jnp.uint32(t)
            for _ in range(3):
                r = jnp.where(r >= t, r - jnp.uint32(t), r)
            return r

        def dec(data, s_ntt_L, q, mu, qinv, qinv_sh, f_hi_tab, f_lo_tab,
                fwd_tw, fwd_tw_sh, inv_tw, inv_tw_sh, n_inv, n_inv_sh):
            import jax.numpy as jnp
            from abc_tpu.crypto.ntt import _fwd_stages, _inv_stages
            from abc_tpu.ops.modarith import jx32 as e
            L = data.shape[-2]
            c_ntt = _fwd_stages(e, data, fwd_tw, fwd_tw_sh, q)
            acc = e.add(c_ntt[0], e.mul(c_ntt[1], s_ntt_L, q, mu), q)
            if data.shape[0] == 3:                        # lazy-relin size 3
                s2 = e.mul(s_ntt_L, s_ntt_L, q, mu)
                acc = e.add(acc, e.mul(c_ntt[2], s2, q, mu), q)
            v = _inv_stages(e, acc, inv_tw, inv_tw_sh, q, n_inv, n_inv_sh)
            y = e.mul_shoup(v, qinv, qinv_sh, q)
            F = jnp.zeros(v.shape[-1], jnp.uint32)        # fractional 2^-32
            msum = jnp.zeros(v.shape[-1], jnp.uint32)     # integer, mod t
            for l in range(L):
                yl = y[l]
                f_hi = f_hi_tab[l, 0]
                f_lo = f_lo_tab[l, 0]
                lo1 = yl * f_hi                           # frac contribution
                hi1 = e.umulhi(yl, f_hi)                  # integer part
                hi2 = e.umulhi(yl, f_lo)                  # frac (2^-32 units)
                F1 = F + lo1
                c1 = (F1 < lo1).astype(jnp.uint32)
                F = F1 + hi2
                c2 = (F < hi2).astype(jnp.uint32)
                msum = reduce_t(msum + reduce_t(hi1 + c1 + c2, e), e)
            half = jnp.uint32(1 << 31)
            m = reduce_t(msum + (F >= half).astype(jnp.uint32), e)
            dist = jnp.where(F >= half, F - half, half - F)
            at_boundary = jnp.any(dist < jnp.uint32(4096))
            # ONE output buffer for the host pull (coefficients + flag):
            # separate buffers cost separate fetch round trips over the
            # tunneled TPU
            packed = jnp.concatenate([m, at_boundary.astype(jnp.uint32)
                                      .reshape(1)])
            return packed, v
        return dec
    return _mjit(("dec", t), make)


# --------------------------------------------------------------------- helpers

def _xp(arr):
    if isinstance(arr, np.ndarray):
        return np
    import jax.numpy as jnp
    return jnp


def _set0(data, c0):
    xp = _xp(data)
    return xp.concatenate([c0[None], data[1:]], axis=0)


def _acc_mod(terms, q, engine):
    """Modular sum over the leading axis: [K, L, n] → [L, n]."""
    if isinstance(terms, np.ndarray):
        s = terms.astype(np.uint64).sum(axis=0)
        return (s % q.astype(np.uint64)).astype(np.uint32)
    acc = terms[0]
    for k in range(1, terms.shape[0]):
        acc = engine.add(acc, terms[k], q)
    return acc
