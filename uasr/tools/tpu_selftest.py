"""On-hardware Pallas-kernel parity self-test.

The pytest suite validates every kernel in interpreter mode on CPU;
this tool re-runs the same parity checks COMPILED on the real TPU, so a
Mosaic lowering or platform-numerics regression is caught without a
full training run (reference behavior being replaced: SURVEY.md §2.1's
delegated-native ops — cuDNN GRU, tf C++ CTC, host FFT frontend).

  python -m uasr.tools.tpu_selftest          # all checks
  python -m uasr.tools.tpu_selftest gru ctc  # subset

Checks (tolerances from measured platform numerics, see BASELINE.md
fidelity rows):
  gru      — pallas_gru_scan fwd vs the lax.scan reference in bf16
             (production dtype), max|Δ| <= 0.02; custom-VJP grads vs
             autodiff-through-scan in f32, rel <= 2e-3. (In bf16 the
             grad paths differ by rounding only — the kernel remats
             gates from the bf16-stored trajectory while autodiff
             differentiates the exact forward — measured rel ~1.6%,
             pure precision noise: the same check in f32 is ~6e-4.)
  ctc      — ctc_loss_pallas vs the log-semiring scan: |Δ| <= 1e-4;
             grads rel <= 1e-3 (loss measured bit-exact on v5e)
  frontend — fused Pallas log-mel vs the XLA GEMM path at the same
             precision tier. Asserted on p99 and on bins with mel
             power > 1e-6: near-floor "silent" bins (~1e-13 power)
             legitimately differ up to ~2e-3 in log domain from GEMM
             summation order alone (documented in BASELINE.md; CMVN
             normalizes them away).
Exit code 0 = all pass.
"""

from __future__ import annotations

import sys

import numpy as np


def _gru():
    import jax
    import jax.numpy as jnp

    from uasr.models.pallas_gru import pallas_gru_scan

    T, G, B, H = 57, 2, 16, 128
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    xproj = jnp.asarray(rng.randn(T, G, B, 3 * H) * 0.5, dt)
    wh = jnp.asarray(rng.randn(G, H, 3 * H) * 0.2, dt)
    bh = jnp.asarray(rng.randn(G, 3 * H) * 0.1, dt)
    lengths = rng.randint(1, T + 1, B)
    fwd_m = np.arange(T)[:, None] < lengths[None, :]
    bwd_m = np.arange(T)[:, None] >= (T - lengths)[None, :]
    tmask = jnp.asarray(np.stack([fwd_m, bwd_m], 1), jnp.bool_)

    def ref_scan(xp, w, b):
        # same math + same carry rounding as the kernel: the carry is
        # rounded to the ys dtype (= xp's dtype) each step
        cdt = xp.dtype

        def step(h, inp):
            x, m = inp
            hp = jnp.einsum("gbh,gho->gbo", h.astype(w.dtype), w,
                            preferred_element_type=jnp.float32) + b[:, None, :]
            xr, xz, xn = jnp.split(x.astype(jnp.float32), 3, -1)
            hr, hz, hn = jnp.split(hp, 3, -1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            hnew = (1 - z) * n + z * h
            hnew = jnp.where(m[:, :, None], hnew, h).astype(cdt)
            return hnew.astype(jnp.float32), hnew

        h0 = jnp.zeros((G, B, H), jnp.float32)
        _, ys = jax.lax.scan(step, h0, (xp, tmask))
        return ys

    ys_p = jax.jit(lambda: pallas_gru_scan(xproj, wh, bh, tmask))()
    ys_r = jax.jit(lambda: ref_scan(xproj, wh, bh))()
    dv = float(jnp.max(jnp.abs(ys_p.astype(jnp.float32)
                               - ys_r.astype(jnp.float32))))
    assert dv <= 0.02, f"gru fwd max|Δ|={dv}"

    # grads in f32 (see module docstring: bf16 differs by rounding only)
    xproj32 = xproj.astype(jnp.float32)
    wh32 = wh.astype(jnp.float32)
    bh32 = bh.astype(jnp.float32)
    w_out = jnp.asarray(rng.randn(T, G, B, H), jnp.float32)

    def loss_p(xp, w, b):
        return jnp.sum(pallas_gru_scan(xp, w, b, tmask).astype(jnp.float32)
                       * w_out)

    def loss_r(xp, w, b):
        return jnp.sum(ref_scan(xp, w, b).astype(jnp.float32) * w_out)

    gp = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2)))(xproj32, wh32, bh32)
    gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2)))(xproj32, wh32, bh32)
    rels = []
    for a, b, name in zip(gp, gr, ("dxproj", "dwh", "dbh")):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        rel = np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-6)
        rels.append(rel)
        assert rel <= 2e-3, f"gru {name} rel={rel}"
    return f"fwd(bf16) max|Δ|={dv:.2e} grads(f32) rel<={max(rels):.1e}"


def _ctc():
    import jax
    import jax.numpy as jnp

    from uasr.ops.ctc import ctc_loss
    from uasr.ops.pallas_ctc import ctc_loss_pallas

    B, T, V, U = 8, 64, 30, 12
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(B, T, V) * 2.0, jnp.float32)
    labels = jnp.asarray(rng.randint(1, V, (B, U)), jnp.int32)
    llen = jnp.asarray(rng.randint(T // 2, T + 1, B), jnp.int32)
    ulen = jnp.asarray(rng.randint(1, U + 1, B), jnp.int32)

    lp = jax.jit(lambda lg: ctc_loss_pallas(lg, llen, labels, ulen))(logits)
    lr = jax.jit(lambda lg: ctc_loss(lg, llen, labels, ulen))(logits)
    dv = float(jnp.max(jnp.abs(lp - lr)))
    assert dv <= 1e-4, f"ctc loss max|Δ|={dv}"

    gp = jax.jit(jax.grad(
        lambda lg: jnp.sum(ctc_loss_pallas(lg, llen, labels, ulen))))(logits)
    gr = jax.jit(jax.grad(
        lambda lg: jnp.sum(ctc_loss(lg, llen, labels, ulen))))(logits)
    rel = float(jnp.max(jnp.abs(gp - gr)) / jnp.max(jnp.abs(gr)))
    assert rel <= 1e-3, f"ctc grad rel={rel}"
    return f"loss max|Δ|={dv:.2e} grad rel={rel:.2e}"


def _frontend():
    import jax
    import jax.numpy as jnp

    from uasr.config import FrontendConfig
    from uasr.frontend.features import (
        frame_audio, make_frontend_state, power_frames, preemphasize,
    )
    from uasr.frontend.pallas_frontend import (
        _LOG_FLOOR, _HI, pallas_log_mel_frontend,
    )

    out = []
    for prec, tol in (("highest", 1e-4), ("high", 5e-3)):
        cfg = FrontendConfig(num_mel_bins=80, precision=prec)
        st = make_frontend_state(cfg)
        rng = np.random.RandomState(2)
        audio = jnp.asarray(rng.randn(4, 3 * 16000) * 0.2, jnp.float32)

        pal = jax.jit(lambda a, cfg=cfg, st=st, prec=prec:
                      pallas_log_mel_frontend(a, st, cfg,
                                              precision=prec))(audio)

        def xla_ref(a, cfg=cfg, st=st, prec=prec):
            x = preemphasize(a, cfg.preemph)
            fr = frame_audio(x, cfg.frame_length, cfg.frame_shift)
            ps = power_frames(fr, st, cfg.n_fft, prec)
            mel = jnp.matmul(ps, st.mel_fb, precision=_HI)
            return jnp.log(jnp.maximum(mel, _LOG_FLOOR)), mel

        ref, mel = jax.jit(xla_ref)(audio)
        Tm = min(pal.shape[1], ref.shape[1])
        d = np.abs(np.asarray(pal[:, :Tm] - ref[:, :Tm]))
        mel_np = np.asarray(mel)[:, :Tm]
        p99 = float(np.percentile(d, 99))
        # log-domain error grows as 1/power toward the floor; assert
        # the loud-bin regime (median power here is ~1e-2)
        loud = float(d[mel_np > 1e-4].max())
        assert p99 <= tol, f"frontend[{prec}] p99={p99} > {tol}"
        assert loud <= tol, f"frontend[{prec}] non-silent max={loud} > {tol}"
        out.append(f"{prec} p99={p99:.1e} non-silent max={loud:.1e}")
    return "; ".join(out)


def _beam():
    import jax
    import jax.numpy as jnp

    from uasr.ops.decode import ctc_beam_search_decode
    from uasr.ops.pallas_beam import ctc_beam_search_decode_pallas

    B, T, V, W = 16, 48, 32, 8
    rng = np.random.RandomState(3)
    logits = jnp.asarray(rng.randn(B, T, V) * 2.0, jnp.float32)
    lengths = jnp.asarray(rng.randint(1, T + 1, B), jnp.int32)
    p = jax.jit(lambda lg: ctc_beam_search_decode_pallas(
        lg, lengths, W, 0))(logits)
    r = jax.jit(lambda lg: ctc_beam_search_decode(
        lg, lengths, W, 0, prune=V, merge_impl="fold"))(logits)
    ids_eq = bool(jnp.all(p[0] == r[0]))
    len_eq = bool(jnp.all(p[1] == r[1]))
    dsc = float(jnp.max(jnp.abs(p[2] - r[2])))
    assert ids_eq and len_eq, "beam ids/lengths differ from XLA beam"
    assert dsc <= 1e-4, f"beam score max|Δ|={dsc}"

    # in-kernel trigram LM fusion (one-hot GEMM against the
    # VMEM-resident table) vs the XLA gather path
    from uasr.ops.lm import build_trigram_lm

    lm = jnp.asarray(build_trigram_lm(
        [rng.randint(1, V, size=rng.randint(2, 10)).tolist()
         for _ in range(40)], V, add_k=0.5, exclude=(0,),
    ))
    kw = dict(lm_weight=0.6, lm_bonus=0.4)
    pl_ = jax.jit(lambda lg: ctc_beam_search_decode_pallas(
        lg, lengths, W, 0, lm_logp=lm, **kw))(logits)
    rl = jax.jit(lambda lg: ctc_beam_search_decode(
        lg, lengths, W, 0, prune=V, merge_impl="fold",
        lm_logp=lm, **kw))(logits)
    lm_eq = bool(jnp.all(pl_[0] == rl[0])) and bool(jnp.all(pl_[1] == rl[1]))
    dlm = float(jnp.max(jnp.abs(pl_[2] - rl[2])))
    assert lm_eq, "LM beam ids/lengths differ from XLA beam"
    assert dlm <= 1e-3, f"LM beam score max|Δ|={dlm}"
    return (f"ids/len exact, score max|Δ|={dsc:.1e}; "
            f"trigram-LM ids/len exact, score max|Δ|={dlm:.1e}")


CHECKS = {"gru": _gru, "ctc": _ctc, "frontend": _frontend, "beam": _beam}


def main(argv=None):
    import jax

    names = (argv or sys.argv[1:]) or list(CHECKS)
    dev = jax.devices()[0]
    print(f"device: {dev.platform} ({dev.device_kind})")
    failed = []
    for n in names:
        try:
            detail = CHECKS[n]()
            print(f"  {n:8s} PASS  {detail}")
        except AssertionError as e:
            print(f"  {n:8s} FAIL  {e}")
            failed.append(n)
    if failed:
        print(f"FAILED: {failed}")
        return 1
    print("all kernel parity checks passed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
