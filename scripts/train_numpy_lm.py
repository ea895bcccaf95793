#!/usr/bin/env python3
"""Offline training of the committed pure-numpy masked LM
(functions/numpy_lm.py) — the Spark analog of the reference's offline
model-training step (the checkpoint the reference downloads pre-trained,
README.md:71; its own offline corpus prep lives in
bert_modeling/create_data.py).

Deterministic (fixed seed, fixed corpus): rerunning this script
reproduces the committed ``assets/numpy_lm.npz`` bit-for-bit on the same
numpy build.  The corpus is the digit-translated CLEAN side of the
synthetic transcripts corpus (sources/transcripts.CORPUS) plus the
variant-suffix charset — i.e. the "correct language" of the synthetic
table, which is exactly what a masked LM is trained on.

Objective: per char position, predict the char from its +/-2 context
window with random window slots dropped to [MASK] (p=0.15) so the model
stays reliable when a neighbouring error position is masked at inference
(two errors within 2 chars, e.g. 苦名丰持人 err [4, 6]).

Run:  python scripts/train_numpy_lm.py [out.npz]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocr_corrector_spark.functions.numpy_lm import (  # noqa: E402
    _WINDOW,
    DEFAULT_CHECKPOINT,
    NumpyMaskedLM,
)
from ocr_corrector_spark.functions.rules import translate_digits  # noqa: E402
from ocr_corrector_spark.functions.tokenizer import (  # noqa: E402
    SPECIAL_TOKENS,
    frame_sentence,
)
from ocr_corrector_spark.sources.transcripts import CORPUS  # noqa: E402

SEED = 20260817
DIM, HIDDEN = 32, 64
EPOCHS = 300
MASK_P = 0.15
LR = 0.01


def corpus_sentences() -> list[str]:
    sents = [translate_digits(clean) for clean, _n, _e, _b in CORPUS]
    # variant rows append 。编号 + CJK-numeral ids (transcripts.py suffix):
    # a few representative suffixed forms so those windows are in-domain
    for i, s in enumerate(list(sents)):
        if len(s) > 4:
            sents.append(s + "。编号" + "零一二三四五六七八九"[i % 10] * 5)
    return sents


def build_vocab(sents: list[str]) -> list[str]:
    charset = sorted({c for s in sents for c in s} | set("。一二三四五六七八九零"))
    return list(SPECIAL_TOKENS) + charset


def training_windows(sents, vocab_idx, rng):
    """(windows int (n,4), labels int (n,)) over every char position of
    every sentence, framed exactly as inference frames them."""
    xs, ys = [], []
    pad = vocab_idx["[PAD]"]
    for s in sents:
        framed, _m, _s = frame_sentence(list(s), [], max_seq_length=10_000)
        ids = [vocab_idx.get(t, vocab_idx["[UNK]"]) for t in framed]
        n_real = 2 + len(s) + 2  # [CLS] 。 text 。 [SEP]
        for p in range(2, 2 + len(s)):  # char positions only
            win = [
                ids[p + o] if 0 <= p + o < n_real else pad for o in _WINDOW
            ]
            xs.append(win)
            ys.append(ids[p])
    return np.asarray(xs, dtype=np.int64), np.asarray(ys, dtype=np.int64)


def train() -> NumpyMaskedLM:
    rng = np.random.RandomState(SEED)
    sents = corpus_sentences()
    tokens = build_vocab(sents)
    vocab_idx = {t: i for i, t in enumerate(tokens)}
    V = len(tokens)
    xs, ys = training_windows(sents, vocab_idx, rng)
    print(f"vocab {V} tokens, {len(xs)} training windows")

    p = {
        "E": rng.normal(0, 0.1, (V, DIM)),
        "W1": rng.normal(0, 0.1, (4 * DIM, HIDDEN)),
        "b1": np.zeros(HIDDEN),
        "W2": rng.normal(0, 0.1, (HIDDEN, DIM)),
        "b2": np.zeros(DIM),
        "gamma": np.ones(DIM),
        "beta": np.zeros(DIM),
        "b_out": np.zeros(V),
    }
    m = {k: np.zeros_like(v) for k, v in p.items()}  # Adam moments
    v = {k: np.zeros_like(val) for k, val in p.items()}
    mask_id = vocab_idx["[MASK]"]
    t_step = 0
    for epoch in range(EPOCHS):
        order = rng.permutation(len(xs))
        for b0 in range(0, len(order), 256):
            idx = order[b0 : b0 + 256]
            w = xs[idx].copy()
            # window-slot mask noise: neighbouring masked errors at inference
            drop = rng.rand(*w.shape) < MASK_P
            w[drop] = mask_id
            y = ys[idx]
            n = len(idx)

            # forward (mirror of NumpyMaskedLM.forward, kept in sync)
            x = p["E"][w].reshape(n, -1)
            h_pre = x @ p["W1"] + p["b1"]
            h = np.tanh(h_pre)
            t_pre = h @ p["W2"] + p["b2"]
            mu = t_pre.mean(axis=1, keepdims=True)
            sd = t_pre.std(axis=1, keepdims=True) + 1e-6
            t_hat = (t_pre - mu) / sd
            t_out = p["gamma"] * t_hat + p["beta"]
            logits = t_out @ p["E"].T + p["b_out"]
            logits -= logits.max(axis=1, keepdims=True)
            e = np.exp(logits)
            probs = e / e.sum(axis=1, keepdims=True)

            # backward (cross-entropy)
            d_logits = probs.copy()
            d_logits[np.arange(n), y] -= 1.0
            d_logits /= n
            g = {}
            g["b_out"] = d_logits.sum(axis=0)
            d_tout = d_logits @ p["E"]
            gE_out = d_logits.T @ t_out  # logits side of tied E
            g["gamma"] = (d_tout * t_hat).sum(axis=0)
            g["beta"] = d_tout.sum(axis=0)
            d_that = d_tout * p["gamma"]
            # layer-norm backward
            D = t_pre.shape[1]
            d_tpre = (
                d_that
                - d_that.mean(axis=1, keepdims=True)
                - t_hat * (d_that * t_hat).mean(axis=1, keepdims=True)
            ) / sd
            g["W2"] = h.T @ d_tpre
            g["b2"] = d_tpre.sum(axis=0)
            d_h = d_tpre @ p["W2"].T
            d_hpre = d_h * (1 - h * h)
            g["W1"] = x.T @ d_hpre
            g["b1"] = d_hpre.sum(axis=0)
            d_x = (d_hpre @ p["W1"].T).reshape(n, 4, DIM)
            gE_in = np.zeros_like(p["E"])
            np.add.at(gE_in, w, d_x)
            g["E"] = gE_in + gE_out

            # Adam
            t_step += 1
            for k in p:
                m[k] = 0.9 * m[k] + 0.1 * g[k]
                v[k] = 0.999 * v[k] + 0.001 * g[k] ** 2
                mh = m[k] / (1 - 0.9**t_step)
                vh = v[k] / (1 - 0.999**t_step)
                p[k] -= LR * mh / (np.sqrt(vh) + 1e-8)
        if (epoch + 1) % 50 == 0:
            x = p["E"][xs].reshape(len(xs), -1)
            h = np.tanh(x @ p["W1"] + p["b1"])
            t_pre = h @ p["W2"] + p["b2"]
            mu = t_pre.mean(axis=1, keepdims=True)
            sd = t_pre.std(axis=1, keepdims=True) + 1e-6
            t_out = p["gamma"] * (t_pre - mu) / sd + p["beta"]
            logits = t_out @ p["E"].T + p["b_out"]
            acc = (logits.argmax(axis=1) == ys).mean()
            print(f"epoch {epoch + 1}: clean-window accuracy {acc:.4f}")

    return NumpyMaskedLM(tokens, p)


def golden_check(model: NumpyMaskedLM) -> None:
    """The bert_corrector doctest goldens through the LM scorer."""
    from ocr_corrector_spark.functions.charsim import CharSim
    from ocr_corrector_spark.assets.char_meta import build_char_meta
    from ocr_corrector_spark.functions.correct_kernels import (
        bert_correct_one_framed,
    )
    from ocr_corrector_spark.functions.numpy_lm import NumpyLMScorer

    scorer = NumpyLMScorer(model=model)
    cs = CharSim(build_char_meta())
    cases = [
        ("我爱北京大安门", [4], "我爱北京天安门"),
        (
            "本着平等、白愿、诚信、互利的原则，一致同意本合同内容，并共同遵守。",
            [5],
            "本着平等、自愿、诚信、互利的原则，一致同意本合同内容，并共同遵守。",
        ),
        (
            "无效、重大暇疵或不符合乙方其他规定的债权资产，乙方有权拒绝，不子初始登",
            [5, 31],
            "无效、重大瑕疵或不符合乙方其他规定的债权资产，乙方有权拒绝，不予初始登",
        ),
        ("国际电台苦名丰持人", [4, 6], "国际电台苦名主持人"),
    ]
    scored = scorer.score_sentences([c[0] for c in cases], [c[1] for c in cases])
    ok = True
    for (text, errs, want), per_err in zip(cases, scored):
        got = bert_correct_one_framed(text, errs, cs, per_err)
        mark = "OK " if got == want else "FAIL"
        if got != want:
            ok = False
            for e, cands in zip(errs, per_err):
                print(f"    pos {e} ({text[e]}): {cands}")
        print(f"  {mark} {text[:14]}... -> {got[:14]}...")
    if not ok:
        raise SystemExit("golden check failed")


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_CHECKPOINT
    model = train()
    golden_check(model)
    model.save(out)
    size = os.path.getsize(out)
    print(f"saved {out} ({size / 1024:.1f} KiB)")
    # round-trip: the committed checkpoint loads and still passes goldens
    golden_check(NumpyMaskedLM.load(out))


if __name__ == "__main__":
    main()
