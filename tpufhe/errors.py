"""Typed exceptions mirroring the reference's error enums
(fhe/src/errors.rs:15-230, fhe-math/src/errors.rs:11-40)."""

from __future__ import annotations


class FheError(Exception):
    """Base class for all tpufhe errors."""


class MathError(FheError):
    """Errors from the math layer (fhe-math/src/errors.rs)."""


class InvalidModulus(MathError):
    def __init__(self, modulus: int):
        super().__init__(f"invalid modulus: {modulus}")
        self.modulus = modulus


class InvalidContext(MathError):
    pass


class InvalidSeedSize(MathError):
    def __init__(self, got: int, expected: int):
        super().__init__(f"invalid seed size {got}, expected {expected}")


class InvalidLevel(FheError):
    def __init__(self, level: int, min_level: int, max_level: int):
        super().__init__(
            f"invalid level {level} (expected {min_level}..={max_level})"
        )
        self.level = level


class EncodingMismatch(FheError):
    def __init__(self, found, expected):
        super().__init__(f"encoding mismatch: found {found}, expected {expected}")


class EncodingNotSupported(FheError):
    pass


class ParametersError(FheError):
    pass


class SerializationError(FheError):
    pass


class TooFewValues(FheError):
    def __init__(self, actual: int, minimum: int):
        super().__init__(f"too few values: {actual} < {minimum}")


class TooManyValues(FheError):
    def __init__(self, actual: int, limit: int):
        super().__init__(f"too many values: {actual} > {limit}")
