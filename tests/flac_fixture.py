"""Minimal FLAC encoder for tests — an independent implementation of the
bitstream spec (verbatim / constant / fixed-predictor subframes, Rice
residuals) used to validate the native C++ decoder against known samples."""

from __future__ import annotations

import struct
from typing import List

import numpy as np


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.bytes.append(self._acc)
                self._acc = 0
                self._n = 0

    def write_signed(self, value: int, nbits: int):
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int):
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self):
        while self._n:
            self.write(0, 1)


def _utf8_number(bw: BitWriter, n: int):
    assert n < 0x80  # frames in tests are few
    bw.write(n, 8)


def encode_flac(samples: np.ndarray, sample_rate: int = 16000,
                bits: int = 16, blocksize: int = 256,
                subframe_type: str = "verbatim") -> bytes:
    """Mono FLAC with one subframe type throughout."""
    samples = np.asarray(samples, np.int64)
    n = len(samples)
    out = bytearray(b"fLaC")

    # STREAMINFO (last metadata block)
    si = BitWriter()
    si.write(blocksize, 16)           # min blocksize
    si.write(blocksize, 16)           # max blocksize
    si.write(0, 24)                   # min frame size (unknown)
    si.write(0, 24)                   # max frame size
    si.write(sample_rate, 20)
    si.write(0, 3)                    # channels - 1
    si.write(bits - 1, 5)
    si.write(n, 36)
    si.align()
    body = bytes(si.bytes) + b"\x00" * 16  # MD5 zeros
    out += struct.pack(">B", 0x80)    # last-block flag + type 0
    out += struct.pack(">I", len(body))[1:]
    out += body

    frame_no = 0
    for off in range(0, n, blocksize):
        block = samples[off: off + blocksize]
        bs = len(block)
        bw = BitWriter()
        bw.write(0x3FFE, 14)          # sync
        bw.write(0, 1)                # reserved
        bw.write(0, 1)                # fixed blocksize strategy
        bw.write(7, 4)                # blocksize: 16-bit at end of header
        bw.write(0, 4)                # sample rate: from STREAMINFO
        bw.write(0, 4)                # channels: mono, independent
        bw.write(4, 3)                # sample size: 16-bit
        bw.write(0, 1)                # reserved
        _utf8_number(bw, frame_no)
        bw.write(bs - 1, 16)
        bw.write(0, 8)                # CRC-8 (decoder does not verify)

        if subframe_type == "verbatim":
            bw.write(0, 1); bw.write(1, 6); bw.write(0, 1)
            for s in block:
                bw.write_signed(int(s), bits)
        elif subframe_type == "constant":
            bw.write(0, 1); bw.write(0, 6); bw.write(0, 1)
            bw.write_signed(int(block[0]), bits)
        elif subframe_type == "fixed2":
            order = 2
            bw.write(0, 1); bw.write(8 + order, 6); bw.write(0, 1)
            for s in block[:order]:
                bw.write_signed(int(s), bits)
            resid = [int(block[i] - (2 * block[i - 1] - block[i - 2]))
                     for i in range(order, bs)]
            bw.write(0, 2)            # 4-bit rice method
            bw.write(0, 4)            # partition order 0
            k = 6
            bw.write(k, 4)
            for r in resid:
                u = (r << 1) ^ (r >> 63) if r >= 0 else ((-r) << 1) - 1
                u = (r << 1) if r >= 0 else ((-r) << 1) - 1  # zigzag
                bw.write_unary(u >> k)
                bw.write(u & ((1 << k) - 1), k)
        else:
            raise ValueError(subframe_type)

        bw.align()
        bw.write(0, 16)               # CRC-16 (not verified)
        out += bytes(bw.bytes)
        frame_no += 1

    return bytes(out)
