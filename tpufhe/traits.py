"""API contracts mirroring the reference's fhe-traits crate
(fhe-traits/src/lib.rs:11-171).

These abstract base classes define the capability surface every scheme
implementation exposes: parametrized objects, plaintext encoders/decoders,
encrypters/decrypters, and the three deserialization flavors (plain,
parametrized, with-context). tpufhe.bfv implements them structurally
(duck-typed); the ABCs serve as documentation and as isinstance targets for
generic user code.
"""

from __future__ import annotations

from abc import ABC, abstractmethod


class FheParameters(ABC):
    """Marker for scheme parameter objects."""


class FheParametrized(ABC):
    """An object tied to a parameter set (exposes `.par`)."""


class FhePlaintextEncoding(ABC):
    """Marker for plaintext encodings."""


class FhePlaintext(FheParametrized):
    """A plaintext with an associated encoding type."""


class FheCiphertext(FheParametrized):
    """A ciphertext (serializable, parametrized)."""


class FheEncoder(ABC):
    """Encode a value into a plaintext."""

    @staticmethod
    @abstractmethod
    def try_encode(value, encoding, par):
        ...


class FheDecoder(ABC):
    """Decode a plaintext into a value."""

    @abstractmethod
    def try_decode(self, encoding=None):
        ...


class FheEncrypter(ABC):
    """Encrypt a plaintext into a ciphertext; RNG passed explicitly."""

    @abstractmethod
    def try_encrypt(self, pt, rng):
        ...


class FheDecrypter(ABC):
    """Decrypt a ciphertext into a plaintext."""

    @abstractmethod
    def try_decrypt(self, ct):
        ...


class Serialize(ABC):
    """Byte-level serialization (wire-compatible with the reference)."""

    @abstractmethod
    def to_bytes(self) -> bytes:
        ...


class Deserialize(ABC):
    @staticmethod
    @abstractmethod
    def try_deserialize(data: bytes):
        ...


class DeserializeParametrized(ABC):
    """Deserialization that needs the parameter set."""

    @staticmethod
    @abstractmethod
    def from_bytes(data: bytes, par):
        ...


class DeserializeWithContext(ABC):
    """Deserialization that needs a polynomial context."""

    @staticmethod
    @abstractmethod
    def from_bytes(data: bytes, ctx):
        ...


class FheParametersSwitchable(ABC):
    """Parameter/modulus switching hook (fhe-traits/src/lib.rs:20-30)."""

    @abstractmethod
    def switch_parameters(self, other):
        ...
