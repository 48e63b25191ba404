"""PIR database helpers (examples/util.rs:72-135)."""

from __future__ import annotations

import math

import numpy as np

from tpufhe.bfv import BfvParameters, Encoding, Plaintext
from tpufhe.utils.transcode import transcode_from_bytes


def generate_database(database_size: int, elements_size: int) -> list[bytes]:
    """Elements of the form [i as 4B little-endian || 0...]."""
    assert database_size > 0 and elements_size > 0
    db = []
    for i in range(database_size):
        el = bytearray(elements_size)
        enc = i.to_bytes(4, "little")[: min(4, elements_size)]
        el[: len(enc)] = enc
        db.append(bytes(el))
    return db


def number_elements_per_plaintext(degree: int, plaintext_nbits: int,
                                  elements_size: int) -> int:
    return (plaintext_nbits * degree) // (elements_size * 8)


def encode_database(database: list[bytes], par: BfvParameters, level: int):
    """Reshape and encode the database as plaintext polynomials."""
    assert database
    elements_size = len(database[0])
    plaintext_nbits = par.plaintext.value.bit_length() - 1
    nept = number_elements_per_plaintext(par.degree(), plaintext_nbits,
                                         elements_size)
    number_rows = -((-len(database)) // nept)
    dim1 = math.ceil(math.sqrt(number_rows))
    dim2 = -((-number_rows) // dim1)

    out = [Plaintext.zero(Encoding.poly(level), par)
           for _ in range(dim1 * dim2)]
    for i in range(number_rows):
        serialized = bytearray(nept * elements_size)
        for j in range(nept):
            idx = j + i * nept
            if idx < len(database):
                serialized[j * elements_size:(j + 1) * elements_size] = database[idx]
        pt_values = transcode_from_bytes(bytes(serialized), plaintext_nbits)
        out[i] = Plaintext.try_encode(pt_values, Encoding.poly(level), par)
    return out, (dim1, dim2)
