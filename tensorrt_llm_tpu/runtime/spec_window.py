"""Device-resident speculative decode window (one-model EAGLE3 / MTP).

The reference runs its drafter inside the overlap loop
(tensorrt_llm/_torch/pyexecutor/py_executor.py:2671) with CUDA-side
acceptance kernels (cpp/tensorrt_llm/kernels/speculativeDecoding/). The
TPU takes that one step further: the whole propose→verify→accept loop
lives in ONE jitted program, iterated K times per dispatch, so
speculative decoding composes with the overlap scheduler and pays the
host round-trip once per K*(d+1) potential tokens.

Per iteration, for every active row:
  1. head CATCH-UP: the previous iteration's emitted (token, feature)
     pairs run through the draft head as a ragged mini-prefill, writing
     verified head-KV entries (overwriting last iteration's speculative
     entries at the same positions); the final row's output proposes
     draft token 0;
  2. d-1 more head steps propose the remaining drafts (speculative
     head-KV entries);
  3. the TARGET verifies [cur, draft_0..draft_{d-1}] in one pass
     (d+1 query rows per sequence) and returns logits + pre-norm hidden
     features;
  4. greedy ACCEPTANCE in-graph: the longest draft prefix matching the
     target's own argmax, plus one bonus token — identical tokens to
     non-speculative greedy decoding by construction;
  5. positions advance by accepted+1. No KV rewind is needed: rejected
     draft KV at positions pos+a+1..pos+d is overwritten by the next
     iteration's verify writes (which start at pos+a+1).

Stop ids / max-token budgets run in-graph exactly like the multi-step
window (model_engine._build_multi_step); the host trims stop-string
overshoot afterwards.

State per sequence slot (device-resident, engine.sd):
  pend_toks  i32[S, d+1]   emitted tokens awaiting head catch-up
  pend_feats [S, d+1, H]   their target features
  pend_n     i32[S]        how many are pending (0 = unseeded)
  pos_h      i32[S]        verified head-KV length
Prefill seeds a row via ``spec_seed`` (first sampled token + its
feature) without any host round-trip — both operands stay on device.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import AttentionMetadata
from ..ops.sampling_ops import SamplingTensors, rejection_sample


@dataclasses.dataclass
class SpecDeviceState:
    head_forward: Any      # (params, feats, toks, kv, md, embed_w) -> h, kv
    head_params: Any
    embed_w: Any
    lm_head_w: Any
    d: int                 # drafts per iteration
    K: int                 # iterations per window
    ps_h: int              # head KV page size
    P_h: int               # head pages per slot
    kv: Any                # head KV pool [S*P_h, ps_h, 2nkv, hd]
    pend_toks: Any
    pend_feats: Any
    pend_n: Any
    pos_h: Any
    pos_t: Any             # i32[S] target write position (device truth —
                           # the host's num_device_tokens runs AHEAD by
                           # the unconsumed window budget under overlap)
    emitted_t: Any         # i32[S] absolute emitted-token count
    fns: Dict[Any, Any] = dataclasses.field(default_factory=dict)
    seed_fn: Any = None


def enable_spec_device(engine, drafter, draft_len: int, K: int) -> None:
    """Attach a one-model draft head to the engine for fused windows.
    The drafter supplies the head function + params (speculative/eagle.py
    Eagle3Drafter or mtp.MtpDrafter); the engine owns slot-aligned head
    KV sized for max_batch_size."""
    S = engine.max_batch_size
    H = engine.model.hidden_size
    ps = drafter.page_size
    P = -(-engine.max_seq_len // ps)
    dtype = engine.model.dtype
    raw_head = drafter._head_forward

    def head3(params, feats, toks, kv, md, embed_w):
        # normalize the two head signatures: EAGLE3 returns (h, kv)
        # where h feeds both lm_head and the next chained step; MTP
        # returns (h_raw, h_normed, kv) with lm_head on the normed one
        out = raw_head(params, feats, toks, kv, md, embed_w)
        if len(out) == 3:
            return out
        h, kv = out
        return h, h, kv

    engine.sd = SpecDeviceState(
        head_forward=head3,
        head_params=drafter.params,
        embed_w=drafter.embed,
        lm_head_w=drafter.lm_head["weight"],
        d=draft_len, K=K, ps_h=ps, P_h=P,
        # entry shape comes from the drafter's own pool: [2*nkv, hd] for
        # EAGLE3, [latent_dim] for MTP's MLA latent cache
        kv=jnp.zeros((S * P, ps) + tuple(drafter.kv.shape[2:]), dtype),
        pend_toks=jnp.zeros((S, draft_len + 1), jnp.int32),
        pend_feats=jnp.zeros((S, draft_len + 1, H), dtype),
        pend_n=jnp.zeros((S,), jnp.int32),
        pos_h=jnp.zeros((S,), jnp.int32),
        pos_t=jnp.zeros((S,), jnp.int32),
        emitted_t=jnp.zeros((S,), jnp.int32))


def spec_seed(engine, tokens_dev, hidden_dev, rows: List[int],
              slots: List[int], positions: List[int],
              emitted: List[int]) -> None:
    """Seed freshly-sampled rows: pending = [(token, feature)], head
    history reset, target write position + absolute emitted count set.
    Token/feature operands are device futures from forward_step —
    nothing crosses the host boundary."""
    sd = engine.sd
    S = engine.max_batch_size
    if sd.seed_fn is None:
        def seed(pt, pf, pn, ph, ptt, emt, toks, hid, rows, slots,
                 pos, emit):
            tok_r = toks[jnp.clip(rows, 0)]
            feat_r = hid[jnp.clip(rows, 0)].astype(pf.dtype)
            pt = pt.at[slots, 0].set(tok_r, mode="drop")
            pf = pf.at[slots, 0].set(feat_r, mode="drop")
            pn = pn.at[slots].set(1, mode="drop")
            ph = ph.at[slots].set(0, mode="drop")
            ptt = ptt.at[slots].set(pos, mode="drop")
            emt = emt.at[slots].set(emit, mode="drop")
            return pt, pf, pn, ph, ptt, emt
        sd.seed_fn = jax.jit(seed, donate_argnums=(0, 1, 2, 3, 4, 5))
    r = np.full(S, -1, np.int32)
    s = np.full(S, S, np.int32)     # S = out of bounds -> dropped
    p = np.zeros(S, np.int32)
    e = np.zeros(S, np.int32)
    r[:len(rows)] = rows
    s[:len(slots)] = slots
    p[:len(positions)] = positions
    e[:len(emitted)] = emitted
    (sd.pend_toks, sd.pend_feats, sd.pend_n, sd.pos_h, sd.pos_t,
     sd.emitted_t) = sd.seed_fn(
        sd.pend_toks, sd.pend_feats, sd.pend_n, sd.pos_h, sd.pos_t,
        sd.emitted_t, tokens_dev, hidden_dev, jnp.asarray(r),
        jnp.asarray(s), jnp.asarray(p), jnp.asarray(e))


def build_spec_window(engine, K: int, Sb: int,
                      all_greedy: bool = True,
                      use_guided: bool = False,
                      num_logprobs: int = 0):
    sd = engine.sd
    model = engine.model
    d = sd.d
    Dp = d + 1
    S = engine.max_batch_size
    ps, P = engine.page_size, engine.pages_per_seq
    ps_h, P_h = sd.ps_h, sd.P_h
    oob_t = engine.num_kv_pages * engine.page_size
    oob_h = S * P_h * ps_h
    NSTOP = engine.NSTOP
    H = model.hidden_size
    hf = sd.head_forward
    # guided x spec (reference: guided_decoder.py:373 rollback on
    # rejected drafts): the verify rows are re-argmaxed SEQUENTIALLY
    # under the grammar mask — position j's mask uses the DFA state
    # after committing candidates 0..j-1 — so the emitted stream is
    # bit-identical to plain guided greedy decoding, and rejected
    # drafts never advance the DFA (the in-graph rollback)
    assert not (use_guided and not all_greedy), \
        "guided spec windows are greedy-only"
    eos_id = getattr(engine, "g_eos_id", 0)

    import jax.random as jrandom
    base_key = jrandom.PRNGKey(0)

    def window(params, kv_pages, prev_tokens, ints, stop_ids, page_indices,
               floats, counter, hparams, hkv, embed_w, lm_head_w,
               pend_toks_all, pend_feats_all, pend_n_all, pos_h_all,
               pos_t_all, emitted_t_all, g_state, g_byte, g_mask,
               g_eos_ok, g_tok_bytes, g_tok_lens):
        # ints i32[7, Sb]: out_slots, budget (window emission cap, bounds
        # this window's KV writes to its pre-allocated pages), absolute
        # max_tokens, absolute min_tokens, top_k, greedy, row_seeds.
        # floats f32[6, Sb]: temperature/top_p/min_p/penalties (penalty
        # rows never take the window; slots are placeholders).
        # Positions + emitted counts are DEVICE state (pos_t/emitted_t):
        # under overlap the host's num_device_tokens runs ahead by the
        # unconsumed budget, so it can never be the source of truth.
        (out_slots, budget, max_tok, min_tok, top_k, greedy_i,
         row_seeds) = ints
        key0 = jrandom.fold_in(base_key, counter)
        sampling = SamplingTensors(
            temperature=floats[0], top_k=top_k, top_p=floats[1],
            min_p=floats[2], greedy=greedy_i.astype(jnp.bool_),
            repetition_penalty=floats[3],
            presence_penalty=floats[4], frequency_penalty=floats[5])
        sampling_r = jax.tree.map(lambda a: jnp.repeat(a, Dp, axis=0),
                                  sampling)
        valid = out_slots >= 0
        slots_c = jnp.clip(out_slots, 0)
        iota = jnp.arange(Sb, dtype=jnp.int32)
        jj = jnp.arange(Dp, dtype=jnp.int32)
        rowbase = iota * Dp
        cu_q = jnp.arange(Sb + 1, dtype=jnp.int32) * Dp
        cu_q1 = jnp.arange(Sb + 1, dtype=jnp.int32)
        num_seqs = jnp.full((1,), Sb, jnp.int32)
        hpages = slots_c[:, None] * P_h + \
            jnp.arange(P_h, dtype=jnp.int32)[None]

        ptoks0 = pend_toks_all[slots_c]
        pfeats0 = pend_feats_all[slots_c]
        pn0 = jnp.where(valid, pend_n_all[slots_c], 0)
        hpos0 = pos_h_all[slots_c]
        pos0 = pos_t_all[slots_c]
        abs0 = emitted_t_all[slots_c]
        active0 = valid & (budget > 0) & (pn0 > 0) & (abs0 < max_tok)

        def live(carry):
            (kv_pages, hkv, ptoks, pfeats, pn, hpos, pos, active,
             win, abs_e, last_tok, key, gst) = carry
            key = jrandom.fold_in(key, 1)
            # 1) head catch-up over pending pairs -> draft 0
            v = (jj[None] < pn[:, None]) & active[:, None]
            hp = hpos[:, None] + jj
            hp_c = jnp.where(v, hp,
                             jnp.maximum(hpos + pn - 1, 0)[:, None])
            hslot = jnp.where(
                v, hpages[iota[:, None],
                          jnp.clip(hp // ps_h, 0, P_h - 1)] * ps_h
                + hp % ps_h, oob_h)
            md = AttentionMetadata(
                kv_lens=jnp.where(active, hpos + pn, 1),
                page_indices=hpages, cu_q_lens=cu_q, num_seqs=num_seqs,
                slot_mapping=hslot.reshape(-1),
                positions=hp_c.reshape(-1),
                logits_indices=rowbase + jnp.clip(pn - 1, 0))
            h_all, f_all, hkv = hf(hparams, pfeats.reshape(Sb * Dp, H),
                                   ptoks.reshape(Sb * Dp), hkv, md,
                                   embed_w)
            f = h_all[rowbase + jnp.clip(pn - 1, 0)]
            d0 = jnp.argmax(
                jnp.dot(f_all[rowbase + jnp.clip(pn - 1, 0)], lm_head_w,
                        preferred_element_type=jnp.float32),
                -1).astype(jnp.int32)
            hbase = hpos + pn     # verified head length after catch-up

            def pbody(pc, t):
                hkv, f, tok = pc
                p = hbase + t
                sm = jnp.where(
                    active, hpages[iota,
                                   jnp.clip(p // ps_h, 0, P_h - 1)] * ps_h
                    + p % ps_h, oob_h)
                md = AttentionMetadata(
                    kv_lens=jnp.where(active, p + 1, 1),
                    page_indices=hpages, cu_q_lens=cu_q1,
                    num_seqs=num_seqs, slot_mapping=sm, positions=p,
                    logits_indices=iota)
                h, fh, hkv = hf(hparams, f, tok, hkv, md, embed_w)
                nxt = jnp.argmax(
                    jnp.dot(fh, lm_head_w,
                            preferred_element_type=jnp.float32),
                    -1).astype(jnp.int32)
                return (hkv, h, nxt), nxt

            if d > 1:
                (hkv, _, _), drest = jax.lax.scan(
                    pbody, (hkv, f, d0), jnp.arange(d - 1))
                drafts = jnp.concatenate([d0[None], drest], axis=0)
            else:
                drafts = d0[None]

            # 2) target verify: q rows = [cur, drafts...]
            qt = jnp.concatenate([last_tok[None], drafts], axis=0).T
            tp = pos[:, None] + jj
            tslot = jnp.where(
                active[:, None],
                page_indices[iota[:, None],
                             jnp.clip(tp // ps, 0, P - 1)] * ps + tp % ps,
                oob_t)
            md_t = AttentionMetadata(
                kv_lens=jnp.where(active, pos + Dp, 1),
                page_indices=page_indices, cu_q_lens=cu_q,
                num_seqs=num_seqs, slot_mapping=tslot.reshape(-1),
                positions=tp.reshape(-1),
                logits_indices=jnp.arange(Sb * Dp, dtype=jnp.int32),
                seq_slots=out_slots)
            logits, kv_pages, hidden = model.forward(
                params, qt.reshape(-1), kv_pages, md_t,
                collect_hidden=True)
            lf = logits.astype(jnp.float32)
            st_seq = None
            if use_guided:
                V = lf.shape[-1]
                lf3 = lf.reshape(Sb, Dp, V).transpose(1, 0, 2)

                def jstep(st, lj):
                    g_act = active & (st >= 0)
                    gsc = jnp.clip(st, 0)
                    mb = g_mask[gsc]
                    bits = (mb[:, :, None] >>
                            jnp.arange(8, dtype=jnp.uint8)) & 1
                    allowed = bits.reshape(Sb, -1)[:, :V].astype(bool)
                    allowed = allowed.at[:, eos_id].set(g_eos_ok[gsc])
                    neg = jnp.finfo(jnp.float32).min
                    ljm = jnp.where(g_act[:, None] & ~allowed, neg, lj)
                    tj = jnp.argmax(ljm, -1).astype(jnp.int32)
                    logz = jax.nn.logsumexp(ljm, -1)
                    lpj = jnp.take_along_axis(
                        ljm, tj[:, None], 1)[:, 0] - logz
                    fb = g_tok_bytes[tj].astype(jnp.int32)
                    flen = g_tok_lens[tj]

                    def walk(kk, s):
                        nxt = g_byte[jnp.clip(s, 0),
                                     fb[:, kk]].astype(jnp.int32)
                        return jnp.where((kk < flen) & (s >= 0), nxt, s)
                    ns = jax.lax.fori_loop(0, fb.shape[1], walk, gsc)
                    ns = jnp.where(tj == eos_id, gsc, ns)
                    st2 = jnp.where(g_act, ns, st)
                    return st2, (tj, lpj, st2)

                _, (tgt_j, lp_j, st_seq) = jax.lax.scan(jstep, gst, lf3)
                tgt = tgt_j.T                        # [Sb, Dp]
                lp = lp_j.T
            elif all_greedy:
                tgt = jnp.argmax(lf, -1).astype(jnp.int32).reshape(Sb, Dp)
                logz = jax.nn.logsumexp(lf, -1)
                chosen = jnp.take_along_axis(
                    lf, tgt.reshape(-1)[:, None], 1)[:, 0]
                lp = (chosen - logz).reshape(Sb, Dp)
            else:
                # lossless sampled acceptance (ops/sampling_ops.py
                # rejection_sample): seeded rows draw the exact
                # position-keyed sample the baseline would (bit-identical
                # stream), unseeded rows true rejection sampling.
                # Acceptance below (draft == emitted prefix) is the same
                # rule either way.
                dr = jnp.concatenate(
                    [drafts, jnp.full((1, Sb), -1, jnp.int32)],
                    axis=0).T.reshape(-1)               # row j <-> draft j
                seeds_r = jnp.repeat(row_seeds, Dp, axis=0)
                pos_r = jnp.repeat(pos + 1, Dp, axis=0) + \
                    jnp.tile(jj, Sb)
                toks_r, lp_r = rejection_sample(
                    lf, sampling_r, key, dr,
                    row_seeds=(seeds_r, pos_r))
                tgt = toks_r.reshape(Sb, Dp)
                lp = lp_r.reshape(Sb, Dp)

            # top-k logprobs per verify row (SamplingParams.logprobs
            # inside the fused window — round-4 composition close)
            if num_logprobs > 0:
                from ..ops.sampling_ops import top_logprobs
                tlv, tli = top_logprobs(lf, num_logprobs)
                tlv = tlv.reshape(Sb, Dp, num_logprobs)
                tli = tli.reshape(Sb, Dp, num_logprobs)
            else:
                tlv = jnp.zeros((Sb, Dp, 1), jnp.float32)
                tli = jnp.zeros((Sb, Dp, 1), jnp.int32)

            # 3) acceptance: longest draft==emitted prefix + bonus
            match = drafts.T == tgt[:, :d]
            acc = jnp.cumprod(match.astype(jnp.int32), axis=1).sum(axis=1)
            c0 = acc + 1
            hit = (tgt[:, :, None] == stop_ids[:, None, :]).any(-1)
            gate = (abs_e[:, None] + jj + 1) >= min_tok[:, None]
            eff = hit & gate & (jj[None] < c0[:, None])
            has_stop = eff.any(-1)
            first = jnp.argmax(eff, -1)
            c1 = jnp.where(has_stop, first + 1, c0)
            c = jnp.minimum(c1, jnp.minimum(
                jnp.maximum(budget - win, 0),
                jnp.maximum(max_tok - abs_e, 0)))
            c = jnp.where(active, c, 0)
            done = has_stop | ((abs_e + c) >= max_tok) | \
                ((win + c) >= budget)
            nxt_active = active & ~done
            out_t = jnp.where(jj[None] < c[:, None], tgt, -1)
            out_lp = jnp.where(jj[None] < c[:, None], lp, 0.0)

            # 4) pending <- emitted pairs; positions advance by c
            hid = hidden.reshape(Sb, Dp, H).astype(pfeats.dtype)
            emitted_any = active & (c > 0)
            ptoks = jnp.where(emitted_any[:, None], tgt, ptoks)
            pfeats = jnp.where(emitted_any[:, None, None], hid, pfeats)
            pn = jnp.where(emitted_any, c, pn)
            hpos = jnp.where(emitted_any, hbase, hpos)
            new_last = jnp.where(emitted_any,
                                 tgt[iota, jnp.clip(c - 1, 0)], last_tok)
            if use_guided:
                # DFA advances by exactly the c COMMITTED tokens:
                # st_seq[j] is the state after candidate j, so the
                # committed state is st_seq[c-1] (rejected drafts never
                # advanced it — the in-graph rollback)
                stc = st_seq[jnp.clip(c - 1, 0), iota]
                gst = jnp.where(active & (c > 0), stc, gst)
            return ((kv_pages, hkv, ptoks, pfeats, pn, hpos, pos + c,
                     nxt_active, win + c, abs_e + c, new_last, key, gst),
                    (out_t, out_lp, c, tlv, tli))

        def dead(carry):
            kL = max(1, num_logprobs)
            return carry, (jnp.full((Sb, Dp), -1, jnp.int32),
                           jnp.zeros((Sb, Dp), jnp.float32),
                           jnp.zeros((Sb,), jnp.int32),
                           jnp.zeros((Sb, Dp, kL), jnp.float32),
                           jnp.zeros((Sb, Dp, kL), jnp.int32))

        def body(carry, _):
            return jax.lax.cond(jnp.any(carry[7]), live, dead, carry)

        last0 = ptoks0[iota, jnp.clip(pn0 - 1, 0)]
        gst0 = g_state[slots_c] if use_guided else \
            jnp.zeros((Sb,), jnp.int32)
        carry0 = (kv_pages, hkv, ptoks0, pfeats0, pn0, hpos0, pos0,
                  active0, jnp.zeros((Sb,), jnp.int32), abs0, last0,
                  key0, gst0)
        carry, (toks, lps, counts, tl_vals, tl_ids) = jax.lax.scan(
            body, carry0, None, length=K)
        (kv_pages, hkv, ptoks, pfeats, pn, hpos, pos, _, win, abs_e,
         last_tok, _, gst) = carry
        sidx = jnp.where(valid, out_slots, S)
        if use_guided:
            g_state = g_state.at[sidx].set(gst, mode="drop")
        pend_toks_all = pend_toks_all.at[sidx].set(ptoks, mode="drop")
        pend_feats_all = pend_feats_all.at[sidx].set(pfeats, mode="drop")
        pend_n_all = pend_n_all.at[sidx].set(pn, mode="drop")
        pos_h_all = pos_h_all.at[sidx].set(hpos, mode="drop")
        pos_t_all = pos_t_all.at[sidx].set(pos, mode="drop")
        emitted_t_all = emitted_t_all.at[sidx].set(abs_e, mode="drop")
        prev_tokens = prev_tokens.at[sidx].set(last_tok, mode="drop")
        return (toks, lps, counts, win, kv_pages, prev_tokens, hkv,
                pend_toks_all, pend_feats_all, pend_n_all, pos_h_all,
                pos_t_all, emitted_t_all, g_state, tl_vals, tl_ids)

    return jax.jit(window,
                   donate_argnums=(1, 2, 9, 12, 13, 14, 15, 16, 17, 18))


def forward_spec_window(engine, batch) -> Any:
    """Dispatch one fused speculative window for a generation-only batch.
    Rows carry ``spec_budget`` (emission cap, set by the executor after
    KV pre-allocation of budget + d tokens). Returns device futures
    (tokens [K, Sb, d+1], logprobs, counts [K, Sb], emitted [Sb])."""
    sd = engine.sd
    reqs = batch.generation_requests
    Sb = engine._pick_row_bucket(len(reqs))
    P = engine.pages_per_seq
    engine.iter_counter += 1
    ints = np.zeros((7, Sb), np.int32)
    ints[0] = -1
    floats = np.zeros((6, Sb), np.float32)
    floats[0] = 1.0
    floats[1] = 1.0
    floats[3] = 1.0
    stop_ids = np.full((Sb, engine.NSTOP), -1, np.int32)
    page_indices = np.zeros((Sb, P), np.int32)
    all_greedy = True
    for i, r in enumerate(reqs):
        sp = r.sampling_params
        ints[0, i] = r.seq_slot
        ints[1, i] = r.spec_budget
        ints[2, i] = sp.max_tokens
        ints[3, i] = sp.min_tokens
        ints[4, i] = sp.top_k
        ints[5, i] = int(sp.greedy)
        if sp.seed:
            ints[6, i] = sp.seed & 0x7FFFFFFF or 1
        all_greedy &= sp.greedy
        floats[0, i] = max(sp.temperature, 1e-5)
        floats[1, i] = sp.top_p
        floats[2, i] = sp.min_p
        ids = list(sp.stop_id_list())[:engine.NSTOP]
        stop_ids[i, :len(ids)] = ids
        blocks = r.kv_block_ids
        page_indices[i, :len(blocks)] = blocks
    use_guided = engine.g_enabled and any(
        r.sampling_params.guided_decoding is not None for r in reqs)
    want_lp = max((r.sampling_params.logprobs or 0) for r in reqs) \
        if reqs else 0
    num_logprobs = 0 if want_lp == 0 else min(
        next(k for k in (1, 5, 8, 20) if k >= min(want_lp, 20)), 20)
    key = ("spec", sd.K, Sb, all_greedy, use_guided, num_logprobs)
    if key not in sd.fns:
        sd.fns[key] = build_spec_window(engine, sd.K, Sb, all_greedy,
                                        use_guided, num_logprobs)
    out = sd.fns[key](engine.params, engine.kv_pages, engine.prev_tokens,
                      jnp.asarray(ints), jnp.asarray(stop_ids),
                      jnp.asarray(page_indices), jnp.asarray(floats),
                      engine.iter_counter, sd.head_params, sd.kv,
                      sd.embed_w, sd.lm_head_w, sd.pend_toks,
                      sd.pend_feats, sd.pend_n, sd.pos_h, sd.pos_t,
                      sd.emitted_t, *engine._guided_args(use_guided))
    (toks, lps, counts, emitted, engine.kv_pages, engine.prev_tokens,
     sd.kv, sd.pend_toks, sd.pend_feats, sd.pend_n, sd.pos_h, sd.pos_t,
     sd.emitted_t, g_state, tl_vals, tl_ids) = out
    if use_guided:
        engine.g_state = g_state
    engine._last_spec_top_lp = (tl_vals, tl_ids) if num_logprobs else None
    return toks, lps, counts, emitted
