#!/usr/bin/env python3
"""Single-node reference-equivalent baseline (numpy-only).

openseize's hot kernels are scipy C routines (oaconvolve, sosfilt,
resample_poly, welch, hilbert). scipy is not installed in this
container, so each kernel is re-expressed with the same algorithmic
core in numpy (FFT overlap-add, rfft periodograms, polyphase dot
products, DF2T recursion). FFT-dominated kernels are faithful proxies
(numpy and scipy share pocketfft); the sosfilt Python loop is an upper
bound on nothing — it is reported separately as 'python-loop' and a
C-speed estimate is derived from per-sample FLOPs.

Data: the same long-format signal graft's Bench uses at sf0.1
(events.parquet -> channel=event_type, x=value), ~20k samples/channel,
5 channels. Usage: python3 scripts/baseline_numpy.py /root/testdata/sf0.1
"""
import json
import sys
import time

import duckdb
import numpy as np

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
rows = duckdb.sql(
    f"SELECT event_type AS ch, value FROM '{sf}/events.parquet' "
    "ORDER BY event_type, event_id").fetchnumpy()
chs = {}
labels = rows["ch"]
vals = rows["value"]
for c in np.unique(labels):
    chs[str(c)] = vals[labels == c].astype(np.float64)
N = sum(len(v) for v in chs.values())


def timed(f, reps=5):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        f()
        best = min(best, time.perf_counter() - t0)
    return best


def kaiser_lp(taps=25, beta=4.0, cutoff=0.2):
    n = np.arange(taps)
    h = np.sinc(cutoff * (n - (taps - 1) / 2)) * cutoff
    w = np.i0(beta * np.sqrt(1 - ((2 * n / (taps - 1)) - 1) ** 2)) / np.i0(beta)
    h = h * w
    return h / h.sum()


res = {}

# FIR 'same' convolution, 25-tap kaiser, all channels (oaconvolve core)
h25 = kaiser_lp(25)
res["fir_kaiser_lp"] = timed(
    lambda: [np.convolve(x, h25, mode="same") for x in chs.values()])

# FFT overlap path on a longer kernel (openseize defaults to oaconvolve)
h251 = kaiser_lp(251)
def fft_conv():
    for x in chs.values():
        n = len(x) + len(h251) - 1
        nf = 1 << (n - 1).bit_length()
        y = np.fft.irfft(np.fft.rfft(x, nf) * np.fft.rfft(h251, nf), nf)[:n]
res["fir_oa_fast_251tap"] = timed(fft_conv)

# Welch PSD: 256-window, 50% overlap, hann (scipy.signal.welch core)
def welch():
    for x in chs.values():
        nper, step = 256, 128
        w = np.hanning(nper)
        segs = np.lib.stride_tricks.sliding_window_view(x, nper)[::step]
        p = (np.abs(np.fft.rfft(segs * w, axis=1)) ** 2).mean(axis=0)
res["psd_welch"] = timed(welch)

# STFT 64-window
def stft():
    for x in chs.values():
        nper, step = 64, 32
        w = np.hanning(nper)
        segs = np.lib.stride_tricks.sliding_window_view(x, nper)[::step]
        np.abs(np.fft.rfft(segs * w, axis=1))
res["stft64"] = timed(stft)

# polyphase resample L=3, M=2 (resample_poly core: per-phase dot products)
def poly():
    L, M = 3, 2
    h = kaiser_lp(75) * L
    for x in chs.values():
        up = np.zeros(len(x) * L)
        up[::L] = x
        y = np.convolve(up, h, mode="same")[::M]
res["resample_3_2"] = timed(poly)

# Hilbert envelope via FFT (scipy.signal.hilbert core)
def hilb():
    for x in chs.values():
        n = len(x)
        X = np.fft.fft(x)
        hmask = np.zeros(n)
        hmask[0] = 1
        hmask[1:(n + 1) // 2] = 2
        if n % 2 == 0:
            hmask[n // 2] = 1
        np.abs(np.fft.ifft(X * hmask))
res["hilbert_env"] = timed(hilb)

# sosfilt: genuinely sequential -- python-loop timing (pessimistic) and
# a C-throughput estimate (5 biquads, ~10 flops/sample/section at
# 500 MFLOP/s-per-lane conservative => ~100 MS/s single core)
sos = np.tile(np.array([0.1, 0.2, 0.1, 1.0, -0.5, 0.2]), (5, 1))
def sosf():
    for x in chs.values():
        z1 = np.zeros(5); z2 = np.zeros(5)
        y = np.empty_like(x)
        for i, u in enumerate(x):
            for s in range(5):
                b0, b1, b2, _, a1, a2 = sos[s]
                v = b0 * u + z1[s]
                z1[s] = b1 * u + z2[s] - a1 * v
                z2[s] = b2 * u - a2 * v
                u = v
            y[i] = u
res["iir_sosfilt_pyloop"] = timed(sosf, reps=1)
res["iir_sosfilt_c_estimate"] = N / 100e6

# exact dedup over documents (hash + unique)
docs = duckdb.sql(f"SELECT text FROM '{sf}/documents.parquet'").fetchnumpy()["text"]
import hashlib
def dedup():
    seen = {}
    for i, t in enumerate(docs):
        k = hashlib.md5(t.encode()).hexdigest()
        seen.setdefault(k, i)
res["dedup_exact"] = timed(dedup)

# brute-force cosine top-5, 10 queries (sim_topk twin)
emb = duckdb.sql(f"SELECT embedding FROM '{sf}/embeddings.parquet' ORDER BY vec_id").fetchnumpy()["embedding"]
V = np.stack([np.asarray(e, dtype=np.float64) for e in emb])
Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
def simtopk():
    S = Vn[:10] @ Vn.T
    np.argsort(-S, axis=1)[:, 1:6]
res["sim_topk"] = timed(simtopk)

out = {"metric": "baseline_numpy_total",
       "value": round(sum(v for k, v in res.items() if k != "iir_sosfilt_pyloop"), 6),
       "unit": "sec", "sf": sf, "n_samples": int(N),
       "queries": {k: round(v, 6) for k, v in res.items()}}
print(json.dumps(out))
