"""BFV parameters: modulus chain, per-level contexts, precomputed scalers.

Behavioral parity with fhe/src/bfv/parameters.rs and fhe/src/bfv/context/:
- BfvParametersBuilder validates degree/moduli, generates NTT-friendly primes
  from sizes (parameters.rs:383-423), builds the per-level context chain with
  delta = lift((-t)^{-1} mod q) as an NttShoup poly, q mod t, the t/q
  decryption scaler (parameters.rs:509-583), the extended 62-bit
  multiplication basis and per-level MultiplicationParameters
  (parameters.rs:586-612), and the SEAL batch-encoder permutation
  (parameters.rs:614-629).
- default_parameters_128 reproduces the homomorphicencryption.org-style
  (n, q) table (parameters.rs:217-294).

All of this is host-side precomputation (exact Python ints) that bakes
static device constants; mirrors SURVEY.md section 3.1.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from tpufhe.ops.ntt import NttOperator
from tpufhe.ops.rns import RnsContext, ScalingFactor
from tpufhe.ops.rq import NTT_SHOUP, Context, Poly, Scaler
from tpufhe.ops.zq import Modulus
from tpufhe.utils.primes import generate_prime
from tpufhe.errors import InvalidLevel, ParametersError


class PlaintextModulus:
    """Small (u64, with Modulus ops) or Large (arbitrary int) plaintext space
    (parameters.rs:23-69)."""

    def __init__(self, t: int):
        self.value = int(t)
        self.is_small = self.value < (1 << 62)
        self.modulus = Modulus(self.value) if self.is_small else None

    def __eq__(self, other):
        return isinstance(other, PlaintextModulus) and self.value == other.value


class CipherPlainContext:
    """Bridge between a ciphertext context and the plaintext space
    (context/cipher_plain_context.rs:10-50)."""

    def __init__(self, plaintext_context, ciphertext_context, delta, q_mod_t,
                 plain_threshold, scaler):
        self.plaintext_context = plaintext_context
        self.ciphertext_context = ciphertext_context
        self.delta = delta  # Poly<NttShoup>: lift((-t)^{-1} mod q)
        self.q_mod_t = q_mod_t
        self.plain_threshold = plain_threshold
        self.scaler = scaler  # Scaler cipher->plaintext with factor t/q


class ContextLevel:
    """A node of the modulus-switching chain (context/chain.rs:12-141)."""

    def __init__(self, poly_context: Context, cipher_plain_context, level: int):
        self.poly_context = poly_context
        self.cipher_plain_context = cipher_plain_context
        self.level = level
        self.num_moduli = poly_context.k
        self.next: ContextLevel | None = None
        self.prev: ContextLevel | None = None
        self._mul_params = None
        self._mul_params_builder = None

    def mul_params(self) -> "MultiplicationParameters":
        if self._mul_params is None:
            self._mul_params = self._mul_params_builder()
        return self._mul_params


@dataclass
class MultiplicationParameters:
    """Extend/tensor/down-scale contexts for one level
    (parameters.rs:694-717)."""

    extender: Scaler
    down_scaler: Scaler
    from_ctx: Context
    to_ctx: Context


class BfvParameters:
    """Consolidated BFV parameters + precomputed per-level data."""

    def __init__(self, degree, moduli, moduli_sizes, variance, context_chain,
                 ntt_operator, plaintext, matrix_reps_index_map):
        self.polynomial_degree = degree
        self.moduli = tuple(moduli)
        self.moduli_sizes = tuple(moduli_sizes)
        self.variance = variance
        self.context_chain = context_chain  # list[ContextLevel], level 0 first
        self.ntt_operator = ntt_operator  # plaintext-space Context or None
        self.plaintext = plaintext
        self.matrix_reps_index_map = matrix_reps_index_map

    # -- accessors mirroring parameters.rs:116-209 --

    def degree(self) -> int:
        return self.polynomial_degree

    def plaintext_value(self) -> int:
        return self.plaintext.value

    def max_level(self) -> int:
        return len(self.moduli) - 1

    def context_at_level(self, level: int) -> Context:
        return self.context_level_at(level).poly_context

    def context_level_at(self, level: int) -> ContextLevel:
        if not (0 <= level <= self.max_level()):
            raise InvalidLevel(level, 0, self.max_level())
        return self.context_chain[level]

    def level_of_context(self, ctx: Context) -> int:
        return self.context_chain[0].poly_context.niterations_to(ctx)

    def __eq__(self, other):
        return (
            isinstance(other, BfvParameters)
            and self.polynomial_degree == other.polynomial_degree
            and self.moduli == other.moduli
            and self.plaintext == other.plaintext
            and self.variance == other.variance
        )

    @staticmethod
    def default_parameters_128(plaintext_nbits: int) -> list["BfvParameters"]:
        """Default ~128-bit-security parameter sets (parameters.rs:217-294)."""
        assert plaintext_nbits < 64
        n_and_qs = {
            1024: [0x7E00001],
            2048: [0x3FFFFFFF000001],
            4096: [0xFFFFEE001, 0xFFFFC4001, 0x1FFFFE0001],
            8192: [
                0x7FFFFFD8001,
                0x7FFFFFC8001,
                0xFFFFFFFC001,
                0xFFFFFF6C001,
                0xFFFFFEBC001,
            ],
            16384: [
                0xFFFFFFFD8001,
                0xFFFFFFFA0001,
                0xFFFFFFF00001,
                0x1FFFFFFF68001,
                0x1FFFFFFF50001,
                0x1FFFFFFEE8001,
                0x1FFFFFFEA0001,
                0x1FFFFFFE88001,
                0x1FFFFFFE48001,
            ],
        }
        out = []
        for n in sorted(n_and_qs):
            moduli = n_and_qs[n]
            t = generate_prime(
                plaintext_nbits, 2 * n, ((1 << 64) - 1) >> (64 - plaintext_nbits)
            )
            if t is None:
                continue
            bits = sum(m.bit_length() for m in moduli)
            if bits < plaintext_nbits:
                continue
            try:
                out.append(
                    BfvParametersBuilder()
                    .set_degree(n)
                    .set_plaintext_modulus(t)
                    .set_moduli(moduli)
                    .build()
                )
            except Exception:
                continue
        if not out:
            raise ParametersError(
                "No default parameters available for this plaintext size"
            )
        return out

    @staticmethod
    def default(num_moduli: int, degree: int) -> "BfvParameters":
        """Test parameters (parameters.rs:300-311)."""
        return (
            BfvParametersBuilder()
            .set_degree(degree)
            .set_plaintext_modulus(1153)
            .set_moduli_sizes([62] * num_moduli)
            .build()
        )

    # Serialize / Deserialize trait surface (fhe-traits/src/lib.rs:128-146)
    def to_bytes(self) -> bytes:
        from tpufhe.serialize.codecs import serialize_parameters

        return serialize_parameters(self)

    @staticmethod
    def try_deserialize(data: bytes) -> "BfvParameters":
        from tpufhe.serialize.codecs import deserialize_parameters

        return deserialize_parameters(data)


class BfvParametersBuilder:
    """Builder mirroring parameters.rs:313-641."""

    def __init__(self):
        self._degree = 0
        self._plaintext = 0
        self._variance = 10
        self._moduli: list[int] = []
        self._moduli_sizes: list[int] = []

    def set_degree(self, degree: int) -> "BfvParametersBuilder":
        self._degree = degree
        return self

    def set_plaintext_modulus(self, t: int) -> "BfvParametersBuilder":
        self._plaintext = int(t)
        return self

    def set_moduli(self, moduli) -> "BfvParametersBuilder":
        self._moduli = [int(m) for m in moduli]
        return self

    def set_moduli_sizes(self, sizes) -> "BfvParametersBuilder":
        self._moduli_sizes = list(sizes)
        return self

    def set_variance(self, variance: int) -> "BfvParametersBuilder":
        self._variance = variance
        return self

    @staticmethod
    def generate_moduli(sizes, degree) -> list[int]:
        """NTT-friendly distinct primes of the given sizes
        (parameters.rs:383-423)."""
        moduli = []
        for i, size in enumerate(sizes):
            if size > 62 or size < 10:
                raise ParametersError(f"modulus size at index {i} must be in 10..=62")
            upper_bound = 1 << size
            while True:
                prime = generate_prime(size, 2 * degree, upper_bound)
                if prime is None:
                    raise ParametersError(
                        f"not enough primes of size {size} for degree {degree}"
                    )
                if prime not in moduli:
                    moduli.append(prime)
                    break
                upper_bound = prime
        return moduli

    def build(self) -> BfvParameters:
        degree = self._degree
        if degree < 8 or (degree & (degree - 1)) != 0:
            raise ParametersError("invalid degree")
        if not (1 <= self._variance <= 16):
            raise ParametersError("invalid variance")

        plaintext = PlaintextModulus(self._plaintext)
        t = plaintext.value

        if self._moduli and self._moduli_sizes:
            raise ParametersError(
                "Only one of `moduli` and `moduli_sizes` can be specified"
            )
        if not self._moduli and not self._moduli_sizes:
            raise ParametersError("moduli or moduli_sizes must be specified")
        moduli = (
            self.generate_moduli(self._moduli_sizes, degree)
            if self._moduli_sizes
            else list(self._moduli)
        )
        moduli_sizes = [m.bit_length() for m in moduli]
        # All-narrow parameter sets (every modulus < 2^30) use the
        # single-lane w30 representation end to end: one residue per 32-bit
        # lane, ~4x cheaper modular primitives (ops/zq32.py). Well inside
        # the reference's 10..62-bit modulus space (zq/primes.rs:30-59).
        narrow = all(m < (1 << 30) for m in moduli)

        # plaintext context: enough moduli so product > t by >= 60 bits
        t_bits = t.bit_length()
        acc, count = 0, 0
        for size in moduli_sizes:
            acc += size
            count += 1
            if acc >= t_bits + 60:
                break
        count = min(max(count, 1), len(moduli))
        plaintext_context = Context(tuple(moduli[:count]), degree, narrow)

        # plaintext-space NTT for SIMD (may be None)
        ntt_operator = None
        if plaintext.is_small:
            try:
                ntt_operator = Context((t,), degree)
            except ValueError:
                ntt_operator = None

        # per-level contexts (reverse order like parameters.rs:509-562)
        cipher_plain_contexts = []
        for i in reversed(range(len(moduli))):
            level_moduli = tuple(moduli[: len(moduli) - i])
            cipher_ctx = Context(level_moduli, degree, narrow)
            delta_rests = []
            for m in level_moduli:
                q = Modulus(m)
                neg_t_mod_q = q.neg(t % m)
                inv = q.inv(neg_t_mod_q)
                if inv is None:
                    raise ParametersError("Inverse failed")
                delta_rests.append(inv)
            rns = cipher_ctx.rns
            delta_int = rns.lift(delta_rests)
            delta = Poly.from_bigint_coeffs([delta_int], cipher_ctx).into_ntt_shoup()
            q_mod_t = rns.product % t
            plain_threshold = (t + 1) >> 1
            scaler = Scaler(
                cipher_ctx, plaintext_context, ScalingFactor(t, rns.product)
            )
            cipher_plain_contexts.append(
                CipherPlainContext(
                    plaintext_context, cipher_ctx, delta, q_mod_t,
                    plain_threshold, scaler,
                )
            )
        cipher_plain_contexts.reverse()

        nodes = [
            ContextLevel(cp.ciphertext_context, cp, lvl)
            for lvl, cp in enumerate(cipher_plain_contexts)
        ]
        for a, b in zip(nodes, nodes[1:]):
            a.next = b
            b.prev = a

        # extended basis for multiplication (parameters.rs:586-593); the
        # extension primes match the base regime (62-bit, or 30-bit when
        # narrow) so the multiplication context stays in the same
        # representation
        ext_size = 30 if narrow else 62
        extended_basis: list[int] = []
        upper_bound = 1 << ext_size
        n_ext_target = len(moduli) + 1 if not narrow else (
            -((-(sum(moduli_sizes) + 60)) // ext_size) + 1)
        while len(extended_basis) != n_ext_target:
            upper_bound = generate_prime(ext_size, 2 * degree, upper_bound)
            if upper_bound not in extended_basis and upper_bound not in moduli:
                extended_basis.append(upper_bound)

        # per-level multiplication parameters, built lazily
        for i, node in enumerate(nodes):
            def make_builder(i=i, node=node):
                def build_mp():
                    modulus_size = sum(moduli_sizes[: len(moduli_sizes) - i])
                    n_extra = -((-(modulus_size + 60)) // ext_size)
                    mul_moduli = tuple(
                        moduli[: len(moduli_sizes) - i] + extended_basis[:n_extra]
                    )
                    mul_ctx = Context(mul_moduli, degree, narrow)
                    return MultiplicationParameters(
                        extender=Scaler(
                            node.poly_context, mul_ctx, ScalingFactor.one()
                        ),
                        down_scaler=Scaler(
                            mul_ctx,
                            node.poly_context,
                            ScalingFactor(t, node.poly_context.modulus()),
                        ),
                        from_ctx=node.poly_context,
                        to_ctx=mul_ctx,
                    )

                return build_mp

            node._mul_params_builder = make_builder()

        # SEAL batch-encoder permutation (parameters.rs:614-629)
        row_size = degree >> 1
        m2 = degree << 1
        pos = 1
        logn = degree.bit_length() - 1
        matrix_reps_index_map = np.zeros(degree, dtype=np.int64)
        for i in range(row_size):
            index1 = (pos - 1) >> 1
            index2 = (m2 - pos - 1) >> 1
            matrix_reps_index_map[i] = int(f"{index1:0{logn}b}"[::-1], 2)
            matrix_reps_index_map[row_size | i] = int(f"{index2:0{logn}b}"[::-1], 2)
            pos = (pos * 3) & (m2 - 1)

        return BfvParameters(
            degree=degree,
            moduli=moduli,
            moduli_sizes=moduli_sizes,
            variance=self._variance,
            context_chain=nodes,
            ntt_operator=ntt_operator,
            plaintext=plaintext,
            matrix_reps_index_map=matrix_reps_index_map,
        )
