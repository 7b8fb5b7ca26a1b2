#!/usr/bin/env python3
"""Independent pin for l69_audio_decode / l70_audio_neardup / AudioOpsSpec.

Parses WAV files with the Python STDLIB `wave` module (an independent
RIFF/fmt/data implementation — no shared code with javax.sound.sampled or
AudioOps) and recomputes the decode-gate metrics and the energy-envelope
fingerprint by the same published recipes AudioOps implements. If the JDK
codec mis-wrote or mis-read the PCM (or the Scala decode were a stub), the
values pinned in AudioOpsSpec would not match.

Stereo files (the l69 synth corpus) print decode-gate metrics:
  s<id>: rate channels frames sum_left sum_right n_clipped
Mono files (the l70 near-dup corpus) print the envelope hash:
  n<id>: hi lo

Usage:
  python3 tools/pin_l69.py <dir-with-{s,n}id.wav-files>
"""
import glob
import os
import struct
import sys
import wave


def samples_le16(frames_bytes):
    n = len(frames_bytes) // 2
    return struct.unpack("<%dh" % n, frames_bytes[: 2 * n])


def gate_metrics(path):
    with wave.open(path, "rb") as w:
        assert w.getsampwidth() == 2, "expected 16-bit PCM"
        rate, ch, nf = w.getframerate(), w.getnchannels(), w.getnframes()
        sm = samples_le16(w.readframes(nf))
    assert ch == 2
    sl = sum(sm[0::2])
    sr = sum(sm[1::2])
    ncl = sum(1 for v in sm if v >= 32000 or v <= -32000)
    return rate, ch, nf, sl, sr, ncl


def envelope_hash(path):
    with wave.open(path, "rb") as w:
        assert w.getsampwidth() == 2 and w.getnchannels() == 1
        nf = w.getnframes()
        sm = samples_le16(w.readframes(nf))
    windows = 65
    n = len(sm)
    cells = []
    for wi in range(windows):
        f0 = wi * n // windows
        f1 = (wi + 1) * n // windows
        cells.append(sum(abs(v) for v in sm[f0:f1]) // (f1 - f0) if f1 > f0 else 0)
    h = 0
    for b in range(64):
        if cells[b] < cells[b + 1]:
            h |= 1 << b
    return h >> 32, h & 0xFFFFFFFF


def main():
    d = sys.argv[1]
    for p in sorted(glob.glob(os.path.join(d, "*.wav")),
                    key=lambda q: os.path.basename(q)):
        base = os.path.basename(p)[:-4]
        if base.startswith("s"):
            print(base, *gate_metrics(p))
        elif base.startswith("n"):
            print(base, *envelope_hash(p))


if __name__ == "__main__":
    main()
