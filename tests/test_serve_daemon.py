"""Dynamic-batching serving daemon (uasr/tools/serve_daemon.py).

Contract under test: streams that join, idle, and leave the batch at
different times each decode EXACTLY what the offline pipeline produces
for their own utterance — per-slot stream ages (serve.py n_frames [B]),
masked stepping, valid-length stamping at END, and slot reset/reuse.
"""

import threading
import time

import numpy as np
import pytest

import jax

from uasr.config import CTCConfig
from uasr.data.dataset import Batch  # noqa: F401 (fixture deps)
from uasr.serve import StreamingRecognizer
from uasr.tools.serve_daemon import ServingEngine, StreamClient, create_server

from test_serve import _cfg, _offline, _train_briefly

CHUNK = 32


@pytest.fixture(scope="module")
def trained():
    cfg, trainer, params, examples = _train_briefly(_cfg("cnn", CHUNK))
    return cfg, trainer, params, examples


def _pick_mixed(examples, n=3):
    """n utterances with genuinely different lengths."""
    by_len = sorted(examples[:16], key=lambda e: len(e[0]))
    picked = [by_len[0], by_len[len(by_len) // 2], by_len[-1]][:n]
    assert len(picked[0][0]) < len(picked[-1][0])
    return [np.asarray(a, np.float32) for a, _ in picked]


def _offline_ref(trainer, params, audios, blank, chunk_samples):
    B = len(audios)
    L = -(-max(len(a) for a in audios) // chunk_samples) * chunk_samples
    audio = np.zeros((B, L), np.float32)
    lens = np.zeros((B,), np.int64)
    for b, a in enumerate(audios):
        audio[b, : len(a)] = a
        lens[b] = len(a)
    _, toks = _offline(trainer, params, audio, lens, blank)
    return toks


def _drain_final(sess, timeout=120.0):
    """Collect partial events until the final one; return (partial_ids,
    final_ids)."""
    partials, deadline = [], time.time() + timeout
    while True:
        kind, ids = sess.events.get(timeout=max(0.1, deadline - time.time()))
        if kind == "final":
            return partials, ids
        partials.extend(ids)


def test_engine_dynamic_join_leave_reuse(trained):
    """3 staggered streams through 2 slots: the third stream reuses a
    freed slot; every final equals the offline decode."""
    cfg, trainer, params, examples = trained
    audios = _pick_mixed(examples, 3)
    ref = _offline_ref(trainer, params, audios, cfg.ctc.blank_id,
                       CHUNK * cfg.frontend.frame_shift)

    rec = StreamingRecognizer(cfg, params, chunk_frames=CHUNK)
    engine = ServingEngine(rec, linger_s=0.0)
    engine.start(2)
    try:
        s0 = engine.open()
        s1 = engine.open()
        assert engine.open() is None  # both slots taken

        # staggered feeding in uneven pieces (1.5 chunks at a time)
        cs = engine.chunk_samples
        piece = cs + cs // 2
        for a, sess in ((audios[0], s0), (audios[1], s1)):
            for off in range(0, len(a), piece):
                engine.feed(sess, a[off : off + piece])
                time.sleep(0.01)  # let ticks interleave mid-stream
        engine.end(s0)
        _, final0 = _drain_final(s0)

        # slot freed -> third stream joins while s1 is still mid-flight
        deadline = time.time() + 60
        s2 = engine.open()
        while s2 is None and time.time() < deadline:
            time.sleep(0.02)
            s2 = engine.open()
        assert s2 is not None, "freed slot was not reusable"
        assert s2.slot == s0.slot
        engine.feed(s2, audios[2])
        engine.end(s2)
        engine.end(s1)
        _, final1 = _drain_final(s1)
        _, final2 = _drain_final(s2)

        assert final0 == ref[0]
        assert final1 == ref[1]
        assert final2 == ref[2]
    finally:
        engine.stop()


def test_fused_step_and_finish_matches_separate_dispatches(trained):
    """masked_step_and_finish (the daemon's single-dispatch finalize
    tick) == masked_step followed by finish_and_reset: identical step
    output, final output, and resulting state, for disjoint
    step/finish slot sets with a length stamp in the same tick."""
    cfg, trainer, params, examples = trained
    audios = _pick_mixed(examples, 3)
    cs = CHUNK * cfg.frontend.frame_shift
    rec = StreamingRecognizer(cfg, params, chunk_frames=CHUNK)

    def chunk_of(a, i):
        out = np.zeros((cs,), np.float32)
        piece = a[i * cs : (i + 1) * cs]
        out[: len(piece)] = piece
        return out

    # warm all three slots with two chunks each
    state = rec.init(3)
    for i in range(2):
        chunks = np.stack([chunk_of(a, i) for a in audios])
        state, _, _ = rec.masked_step(state, chunks, np.ones(3, bool))

    # the tick under test: slots 0,1 step (slot 1 stamps its length),
    # slot 2 finishes+resets
    chunks = np.stack(
        [chunk_of(audios[0], 2), chunk_of(audios[1], 2), np.zeros(cs, np.float32)]
    )
    mask = np.array([True, True, False])
    fmask = np.array([False, False, True])
    smask = np.array([False, True, False])
    samples = np.array([0, len(audios[1]), 0], np.int64)

    st_a, sout_a, fout_a = rec.masked_step_and_finish(
        state, chunks, mask, fmask, smask, samples
    )
    st_b, sout_b = rec.masked_step(
        state, chunks, mask, smask, samples, packed=True
    )
    st_b, fout_b = rec.finish_and_reset(st_b, fmask, packed=True)

    np.testing.assert_array_equal(np.asarray(sout_a), np.asarray(sout_b))
    fa, fb = np.asarray(fout_a), np.asarray(fout_b)
    # finish columns are meaningful only for the finishing slot
    np.testing.assert_array_equal(fa[2], fb[2])
    for la, lb in zip(jax.tree.leaves(st_a), jax.tree.leaves(st_b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_engine_beam_mode_staggered(trained):
    """Beam serving through the engine: per-slot beam state survives
    masked idling and staggered joins; finals equal the offline beam."""
    from uasr.frontend.features import compute_features
    from uasr.ops.decode import ctc_beam_search_decode

    cfg, trainer, params, examples = trained
    cfg2 = cfg.replace(ctc=CTCConfig(blank_id=0, use_beam=True,
                                     beam_width=4))
    audios = _pick_mixed(examples, 2)
    cs = CHUNK * cfg.frontend.frame_shift
    B = len(audios)
    L = -(-max(len(a) for a in audios) // cs) * cs
    audio = np.zeros((B, L), np.float32)
    lens = np.zeros((B,), np.int64)
    for b, a in enumerate(audios):
        audio[b, : len(a)] = a
        lens[b] = len(a)

    @jax.jit
    def offline_beam(audio, lengths):
        feats, flen = compute_features(
            audio, lengths, trainer.frontend_state, trainer.cfg.frontend
        )
        logits, out_len = trainer.model.apply(params, feats, flen)
        return ctc_beam_search_decode(logits, out_len, 4, 0)

    ids_off, len_off, _ = offline_beam(audio, lens)
    ref = [list(np.asarray(ids_off[b, : int(len_off[b])])) for b in range(B)]

    rec = StreamingRecognizer(cfg2, params, chunk_frames=CHUNK)
    engine = ServingEngine(rec, linger_s=0.0)
    engine.start(2)
    try:
        s0 = engine.open()
        engine.feed(s0, audios[0][: 2 * cs])  # s0 two chunks ahead
        time.sleep(0.3)
        s1 = engine.open()
        engine.feed(s0, audios[0][2 * cs :])
        engine.feed(s1, audios[1])
        engine.end(s0)
        engine.end(s1)
        _, final0 = _drain_final(s0)
        _, final1 = _drain_final(s1)
        assert final0 == ref[0]
        assert final1 == ref[1]
    finally:
        engine.stop()


def test_daemon_sockets_concurrent_and_busy(trained):
    """Real TCP round-trip: concurrent clients, busy rejection at
    capacity, slot reuse after a client finishes."""
    cfg, trainer, params, examples = trained
    audios = _pick_mixed(examples, 3)
    ref = _offline_ref(trainer, params, audios, cfg.ctc.blank_id,
                       CHUNK * cfg.frontend.frame_shift)

    server, engine = create_server(cfg, params, port=0, batch=2,
                                   chunk_frames=CHUNK, linger_s=0.0)
    host, port = server.server_address[:2]
    srv = threading.Thread(target=server.serve_forever, daemon=True)
    srv.start()
    try:
        c0 = StreamClient(host, port)
        c1 = StreamClient(host, port)
        cs0 = c0.start()
        cs1 = c1.start()
        assert cs0 == cs1 == engine.chunk_samples

        # at capacity: a third client is rejected
        c_busy = StreamClient(host, port)
        with pytest.raises(RuntimeError, match="busy"):
            c_busy.start()
        c_busy.close()

        results = {}

        def run(client, audio, key):
            half = len(audio) // 2
            client.send_audio(audio[:half])
            time.sleep(0.05)
            client.send_audio(audio[half:])
            results[key] = client.finish()

        t0 = threading.Thread(target=run, args=(c0, audios[0], 0))
        t1 = threading.Thread(target=run, args=(c1, audios[1], 1))
        t0.start(), t1.start()
        t0.join(120), t1.join(120)
        assert results[0] == ref[0]
        assert results[1] == ref[1]

        # capacity released: a new client gets the freed slot
        c2 = StreamClient(host, port)
        deadline = time.time() + 60
        while True:
            try:
                c2.start()
                break
            except RuntimeError:
                c2.close()
                if time.time() > deadline:
                    raise
                time.sleep(0.05)
                c2 = StreamClient(host, port)
        c2.send_audio(audios[2])
        assert c2.finish() == ref[2]
    finally:
        server.shutdown()
        engine.stop()


def test_daemon_dead_client_frees_slot(trained):
    """An abruptly-closed connection releases its slot without
    corrupting the surviving streams."""
    cfg, trainer, params, examples = trained
    audios = _pick_mixed(examples, 2)
    ref = _offline_ref(trainer, params, audios, cfg.ctc.blank_id,
                       CHUNK * cfg.frontend.frame_shift)

    server, engine = create_server(cfg, params, port=0, batch=2,
                                   chunk_frames=CHUNK, linger_s=0.0)
    host, port = server.server_address[:2]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        ghost = StreamClient(host, port)
        ghost.start()
        ghost.send_audio(audios[1][: engine.chunk_samples])
        live = StreamClient(host, port)
        live.start()
        live.send_audio(audios[0])
        # vanish mid-stream (shutdown sends FIN even though the
        # makefile() handle still references the socket)
        import socket as _socket

        ghost.sock.shutdown(_socket.SHUT_RDWR)
        ghost.sock.close()

        assert live.finish() == ref[0]
        # the ghost's slot comes back
        deadline = time.time() + 60
        while len(engine._free) < 2 and time.time() < deadline:
            time.sleep(0.05)
        assert len(engine._free) == 2
    finally:
        server.shutdown()
        engine.stop()
