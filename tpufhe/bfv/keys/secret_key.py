"""Secret keys: CBD sampling, symmetric encryption, decryption, noise meter.

Behavioral parity with fhe/src/bfv/keys/secret_key.rs:
- encrypt_poly: b = e - a*s + m with a expanded from a fresh 32-byte seed
  (secret_key.rs:102-137);
- try_decrypt: phase sum c_i s^i -> t/q scale -> +t, mod q0, mod t
  (secret_key.rs:200-282);
- measure_noise: decrypt, re-encode, report max noise bits
  (secret_key.rs:63-100).
"""

from __future__ import annotations

import numpy as np

from tpufhe.bfv.ciphertext import Ciphertext
from tpufhe.bfv.parameters import BfvParameters
from tpufhe.bfv.plaintext import Plaintext
from tpufhe.ops.rq import NTT, Poly
from tpufhe.utils.sampling import sample_vec_cbd
from tpufhe.errors import ContextMismatch


class SecretKey:
    """Secret-material hygiene (mirrors Zeroize-on-drop,
    secret_key.rs:29-40): coefficients live in one owned numpy buffer;
    `zeroize()` overwrites it in place and is invoked on garbage
    collection. CAVEAT (documented, secret_key.rs has no analogue of
    this): the fused encrypt/decrypt pipelines bind `s` into compiled
    XLA executables as device constants; those device buffers belong to
    the runtime and cannot be scrubbed from Python — zeroization covers
    the host copy only. Call `zeroize()` explicitly when a key is
    retired."""

    def __init__(self, coeffs: np.ndarray, par: BfvParameters):
        self.par = par
        # own a writable buffer so zeroize() can scrub it in place
        self.coeffs = np.array(coeffs, dtype=np.int64, copy=True)

    @staticmethod
    def random(par: BfvParameters, rng) -> "SecretKey":
        return SecretKey(sample_vec_cbd(par.degree(), par.variance, rng), par)

    def zeroize(self):
        """Overwrite the host copy of the key material (rq/mod.rs:135-142,
        secret_key.rs:29-40) and drop cached compiled closures."""
        if getattr(self, "coeffs", None) is not None and self.coeffs.flags.writeable:
            self.coeffs.fill(0)
        for attr in ("_enc_fns", "_dec_fns"):
            if hasattr(self, attr):
                delattr(self, attr)

    def __del__(self):
        try:
            self.zeroize()
        except Exception:
            pass

    def _s_poly(self, ctx) -> Poly:
        return Poly.from_i64_coeffs(self.coeffs, ctx).into_ntt()

    def _encrypt_fn(self, level: int):
        if not hasattr(self, "_enc_fns"):
            self._enc_fns = {}
        if level not in self._enc_fns:
            from tpufhe.pipeline import make_encrypt_with_seed_expansion

            self._enc_fns[level] = make_encrypt_with_seed_expansion(
                self.par, self, level
            )
        return self._enc_fns[level]

    def encrypt_poly(self, p: Poly, rng) -> Ciphertext:
        """Symmetric encryption of an NTT-representation polynomial.

        Host-side sampling (seed expansion, CBD — reference draw order),
        then ONE fused device program: b = NTT(e) - a*s + m."""
        assert p.representation == NTT
        level = self.par.level_of_context(p.ctx)
        seed = rng.fill_bytes(32)
        a = Poly.random_from_seed(p.ctx, seed, NTT)
        e = Poly.from_i64_coeffs(
            sample_vec_cbd(p.ctx.degree, self.par.variance, rng), p.ctx
        )
        b_coeffs = self._encrypt_fn(level)(a.coeffs, e.coeffs, p.coeffs)
        b = Poly(p.ctx, NTT, b_coeffs)
        return Ciphertext(self.par, [b, a], level, seed=seed)

    def try_encrypt(self, pt: Plaintext, rng) -> Ciphertext:
        assert pt.par == self.par
        return self.encrypt_poly(pt.to_poly(), rng)

    def _decrypt_phase_fn(self, level: int):
        """Cached fused (c0, c1) -> scaled plaintext-context residues."""
        if not hasattr(self, "_dec_fns"):
            self._dec_fns = {}
        if level not in self._dec_fns:
            from tpufhe.pipeline import make_decrypt_phase

            self._dec_fns[level] = make_decrypt_phase(self.par, self, level)
        return self._dec_fns[level]

    def try_decrypt(self, ct: Ciphertext) -> Plaintext:
        if ct.par != self.par:
            raise ContextMismatch("Incompatible BFV parameters")
        ctx = ct[0].ctx
        ctx_lvl = self.par.context_level_at(ct.level)
        if len(ct) == 2:
            # fused pipeline: one program instead of ~40 eager dispatches
            from tpufhe.ops.rq import POWER_BASIS

            d_coeffs = self._decrypt_phase_fn(ct.level)(
                ct[0].coeffs, ct[1].coeffs
            )
            plain_ctx = ctx_lvl.cipher_plain_context.plaintext_context
            d = Poly(plain_ctx, POWER_BASIS, d_coeffs)
        else:
            s = self._s_poly(ctx)
            si = s
            c = ct[0]
            for i in range(1, len(ct)):
                c = c + (ct[i] * si)
                if i + 1 < len(ct):
                    si = si * s
            d = ctx_lvl.cipher_plain_context.scaler.scale(c.into_power_basis())

        t = self.par.plaintext.value
        q0 = self.par.moduli[0]
        # first plaintext-context row holds the scaled value mod q0
        row0 = d.to_u64_matrix()[0]
        if self.par.plaintext.is_small:
            w = np.array(
                [((int(v) + t) % q0) % t for v in row0], dtype=np.uint64
            )
            value = w
        else:
            big = d.lift_bigints()
            q_plain = d.ctx.modulus()
            value = [((v + t) % q_plain) % t for v in big]
        poly = (
            Poly.from_u64_coeffs(value, ctx)
            if self.par.plaintext.is_small
            else Poly.from_bigint_coeffs(value, ctx)
        ).into_ntt()
        return Plaintext(self.par, value, None, poly, ct.level)

    def measure_noise(self, ct: Ciphertext) -> int:
        """Max noise bits across coefficients (secret_key.rs:63-100)."""
        pt = self.try_decrypt(ct)
        m = pt.to_poly()
        ctx = ct[0].ctx
        s = self._s_poly(ctx)
        si = s
        c = ct[0]
        for i in range(1, len(ct)):
            c = c + (ct[i] * si)
            si = si * s
        c = (c - m).into_power_basis()
        q = ctx.modulus()
        noise = 0
        for coeff in c.lift_bigints():
            noise = max(noise, min(coeff.bit_length(), (q - coeff).bit_length()))
        return noise

    # Serialize / DeserializeParametrized trait surface
    # (fhe-traits/src/lib.rs:128-154)
    def to_bytes(self) -> bytes:
        from tpufhe.serialize.codecs import serialize_secret_key

        return serialize_secret_key(self)

    @classmethod
    def from_bytes(cls, data: bytes, par) -> "SecretKey":
        from tpufhe.serialize.codecs import deserialize_secret_key

        return deserialize_secret_key(data, par)


