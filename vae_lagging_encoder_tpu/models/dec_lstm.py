"""LSTM decoder p(x|z) for text.

Parity: <ref>modules/decoders/dec_lstm.py §LSTMDecoder (SURVEY.md §2):
- embedding with dropout_in;
- z → Linear(nz, dec_nh) → c0, h0 = tanh(c0);
- **z concatenated to the word embedding at every timestep** (LSTM input
  dim ni + nz);
- dropout_out on LSTM outputs, Linear(dec_nh, V, bias=False) logits;
- ``reconstruct_error`` = token-summed masked cross-entropy per sentence;
- greedy / sample / beam-search decoding.

TPU-first notes:
- the input projection (incl. the z concat) is hoisted into one MXU matmul
  (lstm_core.lstm_run);
- the vocab projection + CE runs as the fused Pallas kernel
  (ops/ce_pallas.py): online logsumexp over streamed vocab tiles, so the
  [N*T, V] logits tensor never exists in HBM (an XLA log_softmax path
  remains for off-tile shapes); for the 500-sample IW evaluation the
  z-sample axis is processed in ``lax.map`` chunks under
  ``jax.checkpoint`` so peak HBM stays bounded (SURVEY.md §7 hard part 4);
- greedy/sampling decode loops are on-device ``lax.fori_loop``s with static
  max length; beam search runs batched on device as one ``lax.while_loop``
  program (``_beam_search_batched``), with the host-side per-row loop kept
  as the parity oracle (SURVEY.md §7 hard part 7).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.vocab import BOS_ID, EOS_ID, PAD_ID
from ..ops.ce_pallas import ce_fusable, fused_ce_logp
from ..ops.vmem import pallas_available
from .decoder import DecoderBase
from .lstm_core import (init_lstm_params, lstm_bias, lstm_cell, lstm_run,
                        uniform)


def _dropout(key, x, rate: float, train: bool):
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


class LSTMDecoder(DecoderBase):
    def __init__(self, vocab_size: int, ni: int, nh: int, nz: int,
                 dropout_in: float = 0.5, dropout_out: float = 0.5,
                 compute_dtype=jnp.float32, iw_chunk: Optional[int] = None,
                 backend: str = "scan"):
        self.vocab_size = vocab_size
        self.ni = ni
        self.nh = nh
        self.nz = nz
        self.dropout_in = dropout_in
        self.dropout_out = dropout_out
        self.compute_dtype = compute_dtype
        self.backend = backend
        # z-sample chunk for reconstruct_error when K is large (IW eval);
        # bounds the per-chunk row count B*iw_chunk and, on the XLA path,
        # the peak [B*iw_chunk, T, V] logits tensor. Default is per backend:
        # 20 measured fastest on v5e at the yahoo config WITH the fused CE
        # kernel (553 ms vs 616 at 10 per IW batch; no logits tensor), but
        # the scan/XLA path materializes the logits, so 20 would double its
        # peak to ~5 GB at yahoo dims — it keeps 10.
        if iw_chunk is None:
            iw_chunk = 20 if (backend == "pallas"
                              and ce_fusable(nh, vocab_size)
                              and pallas_available()) else 10
        self.iw_chunk = iw_chunk

    def init(self, key) -> Dict:
        k_emb, k_lstm, k_trans, k_pred = jax.random.split(key, 4)
        return {
            "emb": uniform(k_emb, (self.vocab_size, self.ni), 0.1),
            "lstm": init_lstm_params(k_lstm, self.ni + self.nz, self.nh, 0.01),
            # <ref>dec_lstm.py §trans_linear: Linear(nz, dec_nh) [MED: bias-free]
            "trans": uniform(k_trans, (self.nz, self.nh), 0.01),
            # <ref>dec_lstm.py §pred_linear: Linear(dec_nh, V, bias=False)
            "pred": uniform(k_pred, (self.nh, self.vocab_size), 0.01),
        }

    # ------------------------------------------------------------------
    def _init_state(self, params, z_flat: jnp.ndarray):
        """z [N, nz] → (h0, c0): c0 = z @ trans, h0 = tanh(c0)."""
        c0 = jnp.dot(z_flat, params["trans"], preferred_element_type=jnp.float32)
        return jnp.tanh(c0), c0

    def _hidden_states(self, params, tokens_in: jnp.ndarray, z: jnp.ndarray,
                       key_in: Optional[jax.Array], train: bool) -> jnp.ndarray:
        """tokens_in [B, T], z [B, K, nz] → LSTM outputs [B*K, T, nh].

        Rows are ordered z-major then batch: row n = (k * B + b) — i.e. the
        K copies of the batch are stacked, matching a reshape of
        [K, B, ...] → [K*B, ...].
        """
        B, T = tokens_in.shape
        K = z.shape[1]
        emb = params["emb"][tokens_in]  # [B, T, ni]
        if key_in is not None:
            emb = _dropout(key_in, emb, self.dropout_in, train)

        # expand to K z-samples: [K*B, T, ni+nz]
        emb_k = jnp.broadcast_to(emb[None], (K, B, T, self.ni)).reshape(K * B, T, self.ni)
        z_flat = z.transpose(1, 0, 2).reshape(K * B, self.nz)
        z_seq = jnp.broadcast_to(z_flat[:, None, :], (K * B, T, self.nz))
        inp = jnp.concatenate([emb_k, z_seq], axis=-1)

        h0, c0 = self._init_state(params, z_flat)
        outs, _ = lstm_run(params["lstm"], inp, mask=None, h0=h0, c0=c0,
                           compute_dtype=self.compute_dtype,
                           backend=self.backend,
                           # eval-mode calls are no-grad (IW-NLL / probes):
                           # allow the wide-batch inference kernel routing
                           inference=not train)
        return outs  # [K*B, T, nh]

    def decode(self, params, tokens_in: jnp.ndarray, z: jnp.ndarray,
               key: Optional[jax.Array] = None, train: bool = False) -> jnp.ndarray:
        """Teacher-forced logits: tokens_in [B, T], z [B, K, nz] → [B, K, T, V].

        Parity: <ref>dec_lstm.py §decode.
        """
        B, T = tokens_in.shape
        K = z.shape[1]
        key_in, key_out = jax.random.split(key) if key is not None else (None, None)
        outs = self._hidden_states(params, tokens_in, z, key_in, train)
        if train and key_out is not None:
            outs = _dropout(key_out, outs, self.dropout_out, train)
        logits = jnp.dot(outs.reshape(-1, self.nh).astype(self.compute_dtype),
                         params["pred"].astype(self.compute_dtype),
                         preferred_element_type=jnp.float32)
        return logits.reshape(K, B, T, self.vocab_size).transpose(1, 0, 2, 3)

    # ------------------------------------------------------------------
    def reconstruct_error(self, params, tokens: jnp.ndarray, mask: jnp.ndarray,
                          z: jnp.ndarray, key: Optional[jax.Array] = None,
                          train: bool = False) -> jnp.ndarray:
        """-log p(x|z) per (sentence, z-sample): [B, K].

        tokens [B, T] = <s> w1..wn </s> pad..; mask [B, T]. Inputs are
        tokens[:, :-1], targets tokens[:, 1:], target mask mask[:, 1:] —
        the token-summed masked CE of <ref>dec_lstm.py §reconstruct_error.
        """
        B, T = tokens.shape
        K = z.shape[1]

        def rec_chunk(z_chunk, chunk_key):  # [B, k, nz] -> [B, k]
            k = z_chunk.shape[1]
            if (self.backend == "pallas"
                    and ce_fusable(self.nh, self.vocab_size)
                    and pallas_available()):
                # Fused vocab-projection + CE (ops/ce_pallas.py): per-token
                # target logp without materializing [k*B*(T-1), V] logits
                # in HBM — used on BOTH the training and IW-eval paths.
                key_in, key_out = (jax.random.split(chunk_key)
                                   if chunk_key is not None else (None, None))
                outs = self._hidden_states(params, tokens[:, :-1], z_chunk,
                                           key_in, train)  # [k*B, T-1, nh]
                if train and key_out is not None:
                    outs = _dropout(key_out, outs, self.dropout_out, train)
                tgt = jnp.broadcast_to(tokens[None, :, 1:],
                                       (k, B, T - 1)).reshape(-1)
                logp = fused_ce_logp(
                    outs.reshape(-1, self.nh).astype(self.compute_dtype),
                    params["pred"].astype(self.compute_dtype), tgt)
                tok_lp = logp.reshape(k, B, T - 1).transpose(1, 0, 2)
                return -jnp.sum(tok_lp * mask[:, None, 1:], axis=-1)
            logits = self.decode(params, tokens[:, :-1], z_chunk, chunk_key,
                                 train)
            tgt = jnp.broadcast_to(tokens[:, None, 1:], (B, k, T - 1))
            if train:
                # log_softmax fuses best with the backward pass
                # (vjp = onehot - softmax in one kernel)
                logp = jax.nn.log_softmax(logits, axis=-1)
                tok_lp = jnp.take_along_axis(logp, tgt[..., None],
                                             axis=-1)[..., 0]
            else:
                # eval (IW-NLL) is fwd-only and HBM-bound at V=20k: gather
                # the target logit + logsumexp, skipping one full [.., V]
                # normalize pass (measured 1209 -> 834 ms per IW batch)
                tgt_logit = jnp.take_along_axis(logits, tgt[..., None],
                                                axis=-1)[..., 0]
                tok_lp = tgt_logit - jax.nn.logsumexp(logits, axis=-1)
            return -jnp.sum(tok_lp * mask[:, None, 1:], axis=-1)

        if K <= self.iw_chunk:
            return rec_chunk(z, key)
        # Chunk the z-sample axis to bound peak logits memory; checkpoint so
        # the backward pass (not needed at eval, but harmless) recomputes.
        # Non-divisible K is padded with dummy samples and sliced off.
        n_chunks = -(-K // self.iw_chunk)
        K_pad = n_chunks * self.iw_chunk
        if K_pad != K:
            z = jnp.concatenate(
                [z, jnp.zeros((B, K_pad - K, self.nz), z.dtype)], axis=1)
        zc = z.reshape(B, n_chunks, self.iw_chunk, self.nz).transpose(1, 0, 2, 3)
        if key is None:
            out = jax.lax.map(jax.checkpoint(lambda zk: rec_chunk(zk, None)),
                              zc)  # [n_chunks, B, c]
        else:
            # Per-chunk dropout keys: without this every chunk would split
            # the same base key and share dropout masks across z-chunks.
            out = jax.lax.map(
                jax.checkpoint(lambda a: rec_chunk(a[0], a[1])),
                (zc, jax.random.split(key, n_chunks)))
        return out.transpose(1, 0, 2).reshape(B, K_pad)[:, :K]

    def log_probability(self, params, tokens, mask, z) -> jnp.ndarray:
        """log p(x|z): [B, K]. Parity: <ref>dec_lstm.py §log_probability."""
        return -self.reconstruct_error(params, tokens, mask, z)

    # ------------------------------------------------------------------
    # Generation. Parity: <ref>dec_lstm.py §greedy_decode/§sample_decode/
    # §beam_search_decode. Greedy/sample run fully on device.
    def _generate(self, params, z: jnp.ndarray, key: Optional[jax.Array],
                  max_len: int, greedy: bool) -> jnp.ndarray:
        """z [N, nz] → token ids [N, max_len] (starts after <s>; pads after </s>).

        Dispatched through a module-level jit: an UN-jitted ``lax.scan``
        executes one device dispatch per op per token — measured 917 ms
        for 32 greedy rows over the TPU tunnel vs 33 ms compiled
        (RESULTS.md round 3).
        """
        return _generate_jit(self, params, z, key, max_len, greedy)

    def greedy_decode(self, params, z: jnp.ndarray, max_len: int = 100) -> jnp.ndarray:
        return self._generate(params, z, None, max_len, greedy=True)

    def sample_decode(self, params, key, z: jnp.ndarray, max_len: int = 100) -> jnp.ndarray:
        return self._generate(params, z, key, max_len, greedy=False)

    def beam_search_decode(self, params, z: jnp.ndarray, beam_width: int = 5,
                           max_len: int = 100,
                           backend: str = "device") -> List[List[int]]:
        """Beam search over a batch of latents.

        Parity: <ref>dec_lstm.py §beam_search_decode (BeamSearchNode loop).
        Two implementations with identical semantics (tested equal on random
        models, tests/test_models.py):

        - ``backend='device'`` (default): the whole search — all N rows ×
          beam_width beams — runs as ONE jitted ``lax.while_loop``, with the
          per-step candidate sort/expansion vectorized (``lax.top_k`` over
          the beam×token grid and a cumulative-sum prefix assignment
          replacing the reference's host-side sort-and-break loop). One
          device dispatch per call instead of N×max_len×beam_width.
        - ``backend='host'``: a per-row Python loop mirroring the
          reference's algorithm statement line by line; kept as the
          correctness oracle and for environments without jit.
        """
        if backend == "device":
            toks, lens = _beam_search_batched(
                self, params, jnp.asarray(z), beam_width, max_len)
            toks, lens = np.asarray(toks), np.asarray(lens)
            return [list(map(int, toks[n, :lens[n]])) for n in range(len(lens))]
        if backend != "host":  # a typo must not silently pick the slow loop
            raise ValueError(f"unknown beam backend {backend!r}")
        return self._beam_search_host(params, z, beam_width, max_len)

    def _beam_search_host(self, params, z: jnp.ndarray, beam_width: int = 5,
                          max_len: int = 100) -> List[List[int]]:
        """Host-side beam search, one row of z at a time (parity with the
        reference's BeamSearchNode loop; off the training path)."""
        z = np.asarray(z)
        results = []
        step_fn = jax.jit(self._beam_step)
        for n in range(z.shape[0]):
            zn = jnp.asarray(z[n:n + 1])
            h0, c0 = self._init_state(params, zn)
            beams = [([BOS_ID], 0.0, (h0, c0))]  # (tokens, logp, state)
            done: List[Tuple[List[int], float]] = []
            for _ in range(max_len):
                cand = []
                for toks, lp, (h, c) in beams:
                    logp, h2, c2 = step_fn(params, zn, jnp.asarray([toks[-1]]), h, c)
                    logp = np.asarray(logp)[0]
                    if beam_width < logp.shape[-1]:
                        top = np.argpartition(-logp, beam_width)[:beam_width]
                    else:  # tiny vocab: expand every token
                        top = np.arange(logp.shape[-1])
                    for t in top:
                        cand.append((toks + [int(t)], lp + float(logp[t]), (h2, c2)))
                cand.sort(key=lambda x: -x[1])
                beams = []
                for toks, lp, st in cand[: beam_width * 2]:
                    if toks[-1] == EOS_ID:
                        done.append((toks, lp / len(toks)))
                    else:
                        beams.append((toks, lp, st))
                    if len(beams) >= beam_width:
                        break
                if not beams or len(done) >= beam_width:
                    break
            if not done:
                done = [(b[0], b[1] / len(b[0])) for b in beams]
            done.sort(key=lambda x: -x[1])
            results.append(done[0][0])
        return results

    def _beam_step(self, params, z, tok, h, c):
        x = jnp.concatenate([params["emb"][tok], z], axis=-1)
        xw = jnp.dot(x, params["lstm"]["wx"],
                     preferred_element_type=jnp.float32) + lstm_bias(params["lstm"])
        h, c = lstm_cell(h, c, xw, params["lstm"]["wh"], self.compute_dtype)
        logits = jnp.dot(h, params["pred"], preferred_element_type=jnp.float32)
        return jax.nn.log_softmax(logits, axis=-1), h, c


from functools import partial  # noqa: E402  (kept near its sole user)


@partial(jax.jit, static_argnums=(0, 4, 5))
def _generate_jit(dec: "LSTMDecoder", params, z: jnp.ndarray,
                  key: Optional[jax.Array], max_len: int,
                  greedy: bool) -> jnp.ndarray:
    """Whole greedy/ancestral decode as ONE compiled ``lax.scan`` program."""
    N = z.shape[0]
    h, c = dec._init_state(params, z)
    wx, wh, b = (params["lstm"]["wx"], params["lstm"]["wh"],
                 lstm_bias(params["lstm"]))

    def step(carry, t):
        h, c, tok, done, k = carry
        x = jnp.concatenate([params["emb"][tok], z], axis=-1)
        xw = jnp.dot(x, wx, preferred_element_type=jnp.float32) + b
        h, c = lstm_cell(h, c, xw, wh, dec.compute_dtype)
        logits = jnp.dot(h, params["pred"], preferred_element_type=jnp.float32)
        if greedy:
            nxt = jnp.argmax(logits, axis=-1)
        else:
            k, sub = jax.random.split(k)
            nxt = jax.random.categorical(sub, logits, axis=-1)
        nxt = jnp.where(done, PAD_ID, nxt).astype(jnp.int32)
        done = done | (nxt == EOS_ID)
        return (h, c, nxt, done, k), nxt

    init = (h, c, jnp.full((N,), BOS_ID, jnp.int32),
            jnp.zeros((N,), bool),
            key if key is not None else jax.random.PRNGKey(0))
    _, toks = jax.lax.scan(step, init, jnp.arange(max_len))
    return toks.T  # [N, max_len]


def _topk_small(x: jnp.ndarray, k: int):
    """Exact top-k over the last axis via k argmax+mask passes.

    XLA's ``lax.top_k`` lowers to a sort on TPU — measured 3.6 ms for
    [160, 20004] k=5 where the producing matmul is 0.66 ms; k linear max
    passes cost 0.68 ms (RESULTS.md round 3). Semantics match ``top_k``
    exactly, including tie order (``argmax`` takes the lowest index first,
    and the mask removes only that position). Falls back to ``top_k``
    where the sort is not the bottleneck (large k or short axes).
    """
    if k >= 16 or x.shape[-1] <= 1024:
        return jax.lax.top_k(x, k)
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    vals, idxs = [], []
    cur, taken = x, jnp.zeros(x.shape, bool)
    for _ in range(k):
        i = jnp.argmax(cur, -1)
        v = jnp.take_along_axis(cur, i[..., None], -1)[..., 0]
        # when every untaken value is -inf, masking can't separate taken
        # from untaken (both -inf) and argmax sticks at 0; top_k's tie
        # order there is ascending index — i.e. the first untaken slot
        i = jnp.where(jnp.isneginf(v), jnp.argmax(~taken, -1), i)
        vals.append(v)
        idxs.append(i)
        hit = iota == i[..., None]
        cur = jnp.where(hit, -jnp.inf, cur)
        taken = taken | hit
    return jnp.stack(vals, -1), jnp.stack(idxs, -1)


@partial(jax.jit, static_argnums=(0, 3, 4))
def _beam_search_batched(dec: LSTMDecoder, params, z: jnp.ndarray,
                         beam_width: int, max_len: int):
    """All-rows, all-beams beam search as ONE ``lax.while_loop`` program.

    Returns ``(toks [N, max_len+1], lens [N])`` — row n's hypothesis is
    ``toks[n, :lens[n]]``, starting with BOS and ending with EOS when one
    finished within ``max_len`` steps.

    Semantics mirror the host loop (``_beam_search_host``) step for step:
    merge every live beam's top-``beam_width`` continuations, sort by total
    logp, truncate to ``2*beam_width`` (the reference's candidate window),
    then scan that window in score order — EOS-ending candidates become
    finished hypotheses scored by length-normalized logp, the rest refill
    the live-beam slots, stopping once ``beam_width`` slots are filled; a
    row terminates when ``beam_width`` hypotheses have finished or no live
    beam remains. The host's sort-and-break loop is replaced by a
    cumulative-sum prefix assignment over the sorted window, so the whole
    search is a single device dispatch instead of N×max_len×beam_width.

    (Candidates whose total logp is exactly -inf — zero-probability
    continuations — are dropped rather than kept at the sort tail; the
    host loop would keep them, but they are unreachable in every non-
    degenerate model and the oracle tests pin equality on real ones.)
    """
    V = dec.vocab_size
    K = W = int(beam_width)
    N = z.shape[0]
    C1 = min(W, V)            # per-beam expansions (host: top-W / whole tiny vocab)
    C2 = min(2 * W, K * C1)   # sorted candidate window (host: cand[:2W])
    T = max_len + 1           # BOS + at most max_len generated tokens
    NEG = jnp.float32(-jnp.inf)

    wx, wh, b = (params["lstm"]["wx"], params["lstm"]["wh"],
                 lstm_bias(params["lstm"]))
    h0, c0 = dec._init_state(params, z)           # [N, nh]

    def expand(a):  # [N, ...] -> [N, K, ...] beam copies
        return jnp.broadcast_to(a[:, None], (N, K) + a.shape[1:])

    z_rep = expand(z).reshape(N * K, -1)
    slot0 = jnp.broadcast_to(jnp.arange(K) == 0, (N, K))

    carry0 = dict(
        t=jnp.int32(0),
        toks=jnp.full((N, K, T), PAD_ID, jnp.int32).at[:, :, 0].set(BOS_ID),
        lens=jnp.ones((N, K), jnp.int32),
        lp=jnp.where(slot0, 0.0, NEG),
        live=slot0,
        last=jnp.full((N, K), BOS_ID, jnp.int32),
        h=expand(h0), c=expand(c0),
        done_count=jnp.zeros((N,), jnp.int32),
        best_score=jnp.full((N,), NEG),
        best_toks=jnp.full((N, T), PAD_ID, jnp.int32),
        best_len=jnp.zeros((N,), jnp.int32),
        finished=jnp.zeros((N,), bool),
    )

    def step(s):
        # one dense LSTM step for every (row, beam) — dead beams ride along
        x = jnp.concatenate([params["emb"][s["last"].reshape(-1)], z_rep], -1)
        xw = jnp.dot(x, wx, preferred_element_type=jnp.float32) + b
        h2, c2 = lstm_cell(s["h"].reshape(N * K, -1),
                           s["c"].reshape(N * K, -1), xw, wh, dec.compute_dtype)
        logits = jnp.dot(h2, params["pred"],
                         preferred_element_type=jnp.float32)
        logp = jax.nn.log_softmax(logits, -1).reshape(N, K, V)
        h2, c2 = h2.reshape(N, K, -1), c2.reshape(N, K, -1)

        top_lp, top_tok = _topk_small(logp, C1)              # [N, K, C1]
        cand = jnp.where(s["live"][:, :, None],
                         s["lp"][:, :, None] + top_lp, NEG)
        cs, ci = jax.lax.top_k(cand.reshape(N, K * C1), C2)  # [N, C2] desc
        beam_i = ci // C1
        tok_i = jnp.take_along_axis(top_tok.reshape(N, K * C1), ci, 1)

        valid = cs > NEG
        is_eos = valid & (tok_i == EOS_ID)
        live_inc = valid & (tok_i != EOS_ID)
        cum_excl = jnp.cumsum(live_inc.astype(jnp.int32), 1) - live_inc
        processed = cum_excl < W          # host stops once W live slots fill

        # refill the K live-beam slots from the processed prefix
        sel = processed & live_inc
        slot_match = sel[:, None, :] & (cum_excl[:, None, :]
                                        == jnp.arange(K)[None, :, None])
        has = slot_match.any(-1)                             # [N, K]
        src = jnp.argmax(slot_match, -1)                     # index into C2
        parent = jnp.take_along_axis(beam_i, src, 1)
        new_tok = jnp.take_along_axis(tok_i, src, 1)
        new_lp = jnp.where(has, jnp.take_along_axis(cs, src, 1), NEG)
        p3 = parent[:, :, None]
        new_toks = jnp.take_along_axis(s["toks"], p3, 1)
        new_lens = jnp.take_along_axis(s["lens"], parent, 1)
        new_toks = jnp.where(jnp.arange(T)[None, None] == new_lens[:, :, None],
                             new_tok[:, :, None], new_toks)
        new_lens = new_lens + 1

        # finished hypotheses: EOS candidates within the processed prefix,
        # scored by length-normalized total logp (len counts BOS..EOS)
        eos_sel = processed & is_eos
        cand_len = jnp.take_along_axis(s["lens"], beam_i, 1) + 1
        norm = jnp.where(eos_sel, cs / cand_len, NEG)
        step_best = norm.max(1)
        bi = jnp.argmax(norm, 1)
        bparent = jnp.take_along_axis(beam_i, bi[:, None], 1)[:, 0]
        btoks = jnp.take_along_axis(s["toks"], bparent[:, None, None],
                                    1)[:, 0]
        blen = jnp.take_along_axis(s["lens"], bparent[:, None], 1)[:, 0]
        btoks = jnp.where(jnp.arange(T)[None] == blen[:, None], EOS_ID, btoks)
        improve = (step_best > s["best_score"]) & ~s["finished"]

        done_count = s["done_count"] + jnp.where(s["finished"], 0,
                                                 eos_sel.sum(1))
        finished = s["finished"] | (done_count >= W) | ~has.any(1)

        frz = s["finished"]                 # rows frozen BEFORE this step
        def keep(old, new):
            return jnp.where(frz.reshape((N,) + (1,) * (new.ndim - 1)),
                             old, new)
        return dict(
            t=s["t"] + 1,
            toks=keep(s["toks"], new_toks),
            lens=keep(s["lens"], new_lens),
            lp=keep(s["lp"], new_lp),
            live=keep(s["live"], has),
            last=keep(s["last"], new_tok),
            h=keep(s["h"], jnp.take_along_axis(h2, p3, 1)),
            c=keep(s["c"], jnp.take_along_axis(c2, p3, 1)),
            done_count=done_count,
            best_score=jnp.where(improve, step_best, s["best_score"]),
            best_toks=jnp.where(improve[:, None], btoks, s["best_toks"]),
            best_len=jnp.where(improve, blen + 1, s["best_len"]),
            finished=finished,
        )

    final = jax.lax.while_loop(
        lambda s: (s["t"] < max_len) & ~s["finished"].all(), step, carry0)

    # rows with no finished hypothesis fall back to the best live beam,
    # normalized by its current length (host: `if not done: done = beams`)
    live_norm = jnp.where(final["live"],
                          final["lp"] / final["lens"], NEG)
    li = jnp.argmax(live_norm, 1)
    ltoks = jnp.take_along_axis(final["toks"], li[:, None, None], 1)[:, 0]
    llen = jnp.take_along_axis(final["lens"], li[:, None], 1)[:, 0]
    use_done = final["done_count"] > 0
    return (jnp.where(use_done[:, None], final["best_toks"], ltoks),
            jnp.where(use_done, final["best_len"], llen))
