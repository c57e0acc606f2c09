"""On-device token sampling.

TPU-native replacement for the reference's CPU sampling stack
(cpp/sampling.cpp + ext_sampling.cpp sample_basic): the whole pipeline —
softmax w/ smoothing exponent, top-k/top-p/top-a/min-p/TFS/typical,
mirostat, dynamic post-temperature, XTC, skew and the multinomial pick —
runs as one jitted [B, V] program on device. This reverses the reference's
logits-to-pinned-host copy (dynamic.py:1224): only sampled ids (+ optional
top probs) cross the tunnel, which on TPU is the difference between ~µs
and ~ms per step.

Every stage is formulated as "zero out masked probabilities in descending-
sorted order", so one sort serves all prefix-style filters; per-batch
parameters are traced arrays (one compilation covers every settings
combination, the analog of sample_basic's per-job scalar args).

Semantics matched to cpp/sampling.cpp:
  softmax exponent / smoothing   sampling.cpp:113-177
  top_k/top_p/top_a/min_p        sampling.cpp:443-641
  tfs                            sampling.cpp:642-710
  typical (x + ln x quirk)       sampling.cpp:748-810
  mirostat pre/post              sampling.cpp:691-745
  post_softmax_temperature       sampling.cpp:195-260
  xtc                            sampling.cpp:812-870 (intended semantics;
                                 the reference's index/prob confusion at
                                 sampling.cpp:856 is not reproduced)
  multinomial + 0.9998 scale     ext_sampling.cpp:270-280
  rep/freq/pres penalty w/ decay sampling.cpp:20-108
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["SamplingParams", "sample", "apply_penalties"]

_EPS = 1e-10


@partial(jax.tree_util.register_dataclass,
         data_fields=["temperature", "smoothing_factor", "top_k", "top_p",
                      "top_a", "min_p", "tfs", "typical", "skew",
                      "temperature_last", "mirostat", "mirostat_mu",
                      "mirostat_tau", "mirostat_eta", "min_temp", "max_temp",
                      "temp_exponent", "xtc_probability", "xtc_threshold",
                      "rep_penalty", "rep_range", "rep_decay",
                      "freq_penalty", "pres_penalty",
                      "dry_multiplier", "dry_base", "dry_allowed_length",
                      "dry_range", "dry_breakers"],
         meta_fields=[])
@dataclasses.dataclass
class SamplingParams:
    """Per-sequence sampling settings, each a [B] array (traced)."""
    temperature: jax.Array
    smoothing_factor: jax.Array
    top_k: jax.Array            # int32; <=0 disables
    top_p: jax.Array            # <=0 or >=1 disables
    top_a: jax.Array            # <=0 disables
    min_p: jax.Array
    tfs: jax.Array
    typical: jax.Array
    skew: jax.Array
    temperature_last: jax.Array  # bool
    mirostat: jax.Array          # bool
    mirostat_mu: jax.Array       # 0 = uninitialized -> 2*tau
    mirostat_tau: jax.Array
    mirostat_eta: jax.Array
    min_temp: jax.Array
    max_temp: jax.Array
    temp_exponent: jax.Array
    xtc_probability: jax.Array
    xtc_threshold: jax.Array
    rep_penalty: jax.Array       # 1.0 disables
    rep_range: jax.Array         # int32; -1 = whole context
    rep_decay: jax.Array         # int32
    freq_penalty: jax.Array
    pres_penalty: jax.Array
    dry_multiplier: jax.Array    # 0 disables DRY
    dry_base: jax.Array
    dry_allowed_length: jax.Array   # int32
    dry_range: jax.Array            # int32; 0 = unlimited
    dry_breakers: jax.Array         # int32 [B, NB], -1 padded

    @classmethod
    def defaults(cls, batch: int, **over) -> "SamplingParams":
        f = lambda v: jnp.full((batch,), v, jnp.float32)
        i = lambda v: jnp.full((batch,), v, jnp.int32)
        b = lambda v: jnp.full((batch,), v, jnp.bool_)
        vals = dict(
            temperature=f(0.8), smoothing_factor=f(0.0), top_k=i(50),
            top_p=f(0.8), top_a=f(0.0), min_p=f(0.0), tfs=f(0.0),
            typical=f(0.0), skew=f(0.0), temperature_last=b(False),
            mirostat=b(False), mirostat_mu=f(0.0), mirostat_tau=f(1.5),
            mirostat_eta=f(0.1), min_temp=f(0.0), max_temp=f(0.0),
            temp_exponent=f(1.0), xtc_probability=f(0.0),
            xtc_threshold=f(0.1), rep_penalty=f(1.0), rep_range=i(-1),
            rep_decay=i(0), freq_penalty=f(0.0), pres_penalty=f(0.0),
            dry_multiplier=f(0.0), dry_base=f(1.75),
            dry_allowed_length=i(2), dry_range=i(0),
            dry_breakers=jnp.full((batch, 8), -1, jnp.int32))
        for k, v in over.items():
            cur = vals[k]
            vals[k] = jnp.full((batch,), v, cur.dtype)
        return cls(**vals)


def apply_penalties(logits: jax.Array, seq: jax.Array, seq_len: jax.Array,
                    p: SamplingParams) -> jax.Array:
    """Repetition / frequency / presence penalties (sampling.cpp:20-108).

    logits [B, V]; seq [B, W] past token ids left-aligned (pad with -1 or
    any id >= V beyond seq_len); seq_len [B] valid lengths. Exact decay
    semantics: full penalty over the last `rep_range` tokens, then linear
    decay to zero over the next `rep_decay` tokens; rep/pres apply once at
    a token's newest occurrence, freq accumulates per occurrence.
    """
    bsz, v = logits.shape
    w = seq.shape[1]
    pos = jnp.arange(w, dtype=jnp.int32)[None, :]            # [1, W]
    age = seq_len[:, None] - 1 - pos                         # [B, W], 0=newest
    valid = (age >= 0) & (seq >= 0) & (seq < v)

    sust = jnp.where(p.rep_range < 0, seq_len, p.rep_range)[:, None]
    decay = p.rep_decay[:, None].astype(jnp.float32)
    # steps past the sustain window (j+1 decrements in the reference loop)
    over = jnp.maximum(age - sust + 1, 0).astype(jnp.float32)
    in_range = valid & (age < sust + p.rep_decay[:, None])
    dec_frac = jnp.where(decay > 0, jnp.minimum(over / decay, 1.0),
                         jnp.where(over > 0, 1.0, 0.0))

    rep_w = p.rep_penalty[:, None] + (1.0 - p.rep_penalty[:, None]) * dec_frac
    freq_w = p.freq_penalty[:, None] * (1.0 - dec_frac)
    pres_w = p.pres_penalty[:, None] * (1.0 - dec_frac)

    tok = jnp.where(in_range, seq, v)                        # dump others
    bidx = jnp.broadcast_to(jnp.arange(bsz)[:, None], tok.shape)

    # newest occurrence age per vocab id -> scatter-min
    big = jnp.full((bsz, v + 1), jnp.int32(0x7FFFFFFF))
    newest = big.at[bidx, tok].min(jnp.where(in_range, age, 0x7FFFFFFF))
    newest = newest[:, :v]
    seen = newest < 0x7FFFFFFF

    # decayed rep/pres value at the newest occurrence
    rep_at = jnp.zeros((bsz, v + 1), jnp.float32).at[bidx, tok].max(
        jnp.where(in_range & (age == newest[bidx, jnp.minimum(tok, v - 1)]),
                  rep_w, 0.0))[:, :v]
    pres_at = jnp.zeros((bsz, v + 1), jnp.float32).at[bidx, tok].max(
        jnp.where(in_range & (age == newest[bidx, jnp.minimum(tok, v - 1)]),
                  pres_w, 0.0))[:, :v]
    freq_sum = jnp.zeros((bsz, v + 1), jnp.float32).at[bidx, tok].add(
        jnp.where(in_range, freq_w, 0.0))[:, :v]

    rep_at = jnp.where(seen, jnp.maximum(rep_at, 1e-6), 1.0)
    out = jnp.where(logits > 0, logits / rep_at, logits * rep_at)
    out = out - jnp.where(seen, pres_at, 0.0) - freq_sum
    return out


def unpack_mask(packed: jax.Array, v: int) -> jax.Array:
    """Packed uint8 bitmask [B, ceil(V/8)] -> bool [B, V] (LSB-first).

    Logit masks cross the host->device tunnel packed (8x less traffic);
    unpacking is a trivial VPU op. Used for filters / token healing /
    banned tokens (the reference's logit_filter bool tensor,
    sampler.py:446-505)."""
    b = packed.shape[0]
    bits = (packed[:, :, None] >> jnp.arange(8, dtype=jnp.uint8)) & 1
    return bits.reshape(b, -1)[:, :v] != 0


def apply_dry(logits: jax.Array, seq: jax.Array, seq_len: jax.Array,
              multiplier: jax.Array, base: jax.Array,
              allowed_length: jax.Array, dry_range: jax.Array,
              breakers: jax.Array, max_ngram: int = 20) -> jax.Array:
    """DRY repetition penalty (sampler.py:191-272), device formulation.

    For every past position i, compute the length of the longest suffix
    match: seq[i-k] == seq[L-1-k] for k = 0..max_ngram-1 (stopping at
    sequence breakers), then penalize the token that followed position i
    by multiplier * base^(match_len - allowed_length).

    seq [B, W] (-1 padded), seq_len [B]; breakers [B, NB] token ids (-1
    padded). multiplier == 0 disables (returns logits unchanged).
    """
    bsz, v = logits.shape
    w = seq.shape[1]
    pos = jnp.arange(w, dtype=jnp.int32)[None, :]
    last = seq_len[:, None] - 1                              # index of z-1
    valid = (pos < seq_len[:, None]) & (seq >= 0)

    is_break = jnp.zeros_like(valid)
    for jb in range(breakers.shape[1]):
        bcol = breakers[:, jb:jb + 1]
        is_break |= (seq == bcol) & (bcol >= 0)

    # match_len[i]: longest k with seq[i-k+1..i] == suffix ending at L-1,
    # no breaker inside either window
    mlen = jnp.zeros((bsz, w), jnp.int32)
    alive = jnp.ones((bsz, w), dtype=bool)
    seq_pad = jnp.where(valid, seq, -2)
    for k in range(max_ngram):
        # compare seq[i-k] with seq[last-k]
        idx_i = pos - k
        idx_t = last - k
        a = jnp.take_along_axis(seq_pad, jnp.maximum(idx_i, 0), axis=1)
        bb = jnp.take_along_axis(seq_pad, jnp.maximum(idx_t, 0), axis=1)
        ok = (a == bb) & (idx_i >= 0) & (idx_t >= 0) & (a >= 0)
        brk_a = jnp.take_along_axis(is_break, jnp.maximum(idx_i, 0), axis=1)
        brk_b = jnp.take_along_axis(is_break, jnp.maximum(idx_t, 0), axis=1)
        ok &= ~brk_a & ~brk_b
        alive &= ok
        mlen = jnp.where(alive, k + 1, mlen)

    # restrict to the dry_range most recent positions (0 = unlimited)
    in_range = jnp.where(dry_range[:, None] > 0,
                         pos >= seq_len[:, None] - dry_range[:, None],
                         True)
    # position i's match predicts token seq[i+1]
    nxt_idx = jnp.minimum(pos + 1, w - 1)
    nxt = jnp.take_along_axis(seq_pad, nxt_idx, axis=1)
    use = valid & in_range & (pos + 1 < seq_len[:, None]) & \
        (mlen >= allowed_length[:, None]) & (nxt >= 0) & (nxt < v)

    tok = jnp.where(use, nxt, v)
    bidx = jnp.broadcast_to(jnp.arange(bsz)[:, None], tok.shape)
    best = jnp.zeros((bsz, v + 1), jnp.int32).at[bidx, tok].max(
        jnp.where(use, mlen, 0))[:, :v]
    pen = multiplier[:, None] * jnp.power(
        jnp.maximum(base[:, None], 1e-6),
        (best - allowed_length[:, None]).astype(jnp.float32))
    pen = jnp.where(best > 0, pen, 0.0)
    return jnp.where(multiplier[:, None] > 0, logits - pen, logits)


def _norm(sp):
    s = jnp.sum(sp, axis=-1, keepdims=True)
    return sp / jnp.maximum(s, _EPS)


def sample(key: jax.Array, logits: jax.Array, p: SamplingParams,
           logit_filter: jax.Array | None = None,
           xtc_mask: jax.Array | None = None,
           return_top: int = 0):
    """-> (tokens [B] i32, probs [B] f32, new_mirostat_mu [B]
    [, top_probs [B, n], top_tokens [B, n]]).

    logits [B, V] f32; logit_filter optional bool [B, V] (False = blocked);
    xtc_mask optional bool [B, V] (True = XTC may exclude).
    """
    bsz, v = logits.shape
    rank = jnp.broadcast_to(jnp.arange(v, dtype=jnp.int32)[None], (bsz, v))

    # greedy shortcut (ext_sampling.cpp:148-152)
    greedy = p.temperature < 0.01
    temp = jnp.where(greedy, 1.0, p.temperature)
    top_k = jnp.where(greedy, 1, jnp.where(p.top_k <= 0, v, p.top_k))

    pre_t = jnp.where(p.temperature_last, 1.0, temp)
    post_t = jnp.where(p.temperature_last, temp, 1.0)
    smooth = p.smoothing_factor > 0
    exponent2 = smooth
    pre_t = jnp.where(smooth, pre_t / jnp.maximum(p.smoothing_factor, _EPS),
                      pre_t)

    lg = logits.astype(jnp.float32)
    if logit_filter is not None:
        lg = jnp.where(logit_filter, lg, -jnp.inf)
    z = lg - jnp.max(lg, axis=-1, keepdims=True)
    z = jnp.where(jnp.isfinite(z), z, -jnp.inf)
    z = jnp.where(exponent2[:, None], -jnp.abs(z) * jnp.abs(z), z)
    probs = jax.nn.softmax(z / pre_t[:, None], axis=-1)

    # one descending sort serves all prefix filters
    neg_sp, si = jax.lax.sort_key_val(-probs, rank, dimension=-1)
    sp = -neg_sp
    if xtc_mask is not None:
        xtc_sorted = jnp.take_along_axis(xtc_mask, si, axis=-1)
    else:
        xtc_sorted = jnp.ones_like(sp, dtype=bool)

    def keep(sp, cond, enabled):
        cond = cond | (rank == 0) | ~enabled[:, None]
        return jnp.where(cond, sp, 0.0)

    # top_k (prefix by construction)
    sp = jnp.where(rank < top_k[:, None], sp, 0.0)

    # top_p: keep until cumulative (normalized) mass exceeds top_p
    q = _norm(sp)
    cum = jnp.cumsum(q, axis=-1)
    # smallest prefix whose mass exceeds top_p: the crossing token is kept,
    # so keep while the exclusive cumsum is still below the threshold
    en = (p.top_p > 0.0) & (p.top_p < 1.0)
    sp = keep(sp, (cum - q) < p.top_p[:, None], en)

    # top_a: q_i >= a * q0^2
    q = _norm(sp)
    q0 = q[:, :1]
    en = p.top_a > 0.0
    sp = keep(sp, q >= p.top_a[:, None] * q0 * q0, en)

    # min_p: q_i >= min_p * q0
    q = _norm(sp)
    q0 = q[:, :1]
    en = (p.min_p > 0.0) & (p.min_p < 1.0)
    sp = keep(sp, q >= p.min_p[:, None] * q0, en)

    # tfs: cumulative normalized |2nd derivative| <= tfs (+1)
    q = _norm(sp)
    d = jnp.abs(-q[:, :-2] + 2.0 * q[:, 1:-1] - q[:, 2:])
    dsum = jnp.sum(d, axis=-1, keepdims=True)
    dcum = jnp.cumsum(d / jnp.maximum(dsum, _EPS), axis=-1)
    kept = jnp.sum((dcum <= p.tfs[:, None]).astype(jnp.int32), axis=-1) + 1
    en = (p.tfs > 0.0) & (p.tfs < 1.0) & \
         (jnp.sum((sp > 0).astype(jnp.int32), axis=-1) >= 3)
    sp = keep(sp, rank < kept[:, None], en)

    # typical: reference quirk y = p + ln(p+eps) (sampling.cpp:768-772)
    q = _norm(sp)
    active = sp > 0.0
    y = q + jnp.log(q + 1e-10)
    neg_ent = jnp.sum(jnp.where(active, q * y, 0.0), axis=-1, keepdims=True)
    dev = jnp.where(active, jnp.abs(y - neg_ent), jnp.inf)
    dev_sorted_q = jnp.take_along_axis(
        q, jnp.argsort(dev, axis=-1), axis=-1)
    cumprob = jnp.cumsum(dev_sorted_q, axis=-1)
    num = jnp.sum((cumprob - dev_sorted_q < p.typical[:, None])
                  .astype(jnp.int32), axis=-1)
    num = jnp.maximum(num, 1)
    # keep the `num` tokens with smallest deviation
    dev_rank = jnp.argsort(jnp.argsort(dev, axis=-1), axis=-1)
    en = (p.typical > 0.0) & (p.typical < 1.0)
    sp = keep(sp, dev_rank < num[:, None], en)

    # mirostat: drop tokens with surprise > mu (sampling.cpp:691-719)
    mu = jnp.where(p.mirostat_mu == 0.0, 2.0 * p.mirostat_tau, p.mirostat_mu)
    q = _norm(sp)
    target = jnp.exp2(-mu)[:, None]
    sp = keep(sp, q >= target, p.mirostat)

    # post-softmax / dynamic temperature (sampling.cpp:195-260)
    q = _norm(sp)
    active = q > 0.0
    ent = -jnp.sum(jnp.where(active, q * jnp.log(q + _EPS), 0.0), axis=-1)
    ncand = jnp.maximum(jnp.sum(active.astype(jnp.int32), axis=-1), 2)
    max_ent = jnp.log(ncand.astype(jnp.float32))
    dyn = p.max_temp > p.min_temp
    dyn_t = p.min_temp + (p.max_temp - p.min_temp) * \
        (ent / jnp.maximum(max_ent, _EPS)) ** p.temp_exponent
    pt = jnp.where(dyn, dyn_t, post_t)
    do_post = dyn | (post_t != 1.0)
    qp = jnp.where(active, q ** (1.0 / jnp.maximum(pt, _EPS))[:, None], 0.0)
    sp = jnp.where(do_post[:, None], qp, q)

    # xtc (intended semantics of sampling.cpp:812-870)
    q = _norm(sp)
    over = (q >= p.xtc_threshold[:, None]) & xtc_sorted & (q > 0.0)
    x_tokens = jnp.sum(over.astype(jnp.int32), axis=-1, keepdims=True)
    minp_over = jnp.min(jnp.where(over, q, 2.0), axis=-1, keepdims=True)
    x_mass = jnp.sum(jnp.where(over, q, 0.0), axis=-1, keepdims=True) \
        - minp_over
    is_min = over & (q == minp_over)
    excl = over & ~is_min
    xp = p.xtc_probability[:, None]
    boost = 1.0 + xp * x_mass / jnp.maximum(1.0 - x_mass, _EPS)
    q_xtc = jnp.where(excl, q * (1.0 - xp), q * boost)
    apply_xtc = (p.xtc_probability > 0.0)[:, None] & (x_tokens >= 2)
    sp = jnp.where(apply_xtc, q_xtc, sp)

    # multinomial pick (ext_sampling.cpp:270-280): inverse CDF in sorted
    # order at random point r^exp(-skew) * 0.9998
    s_final = jnp.sum(sp, axis=-1, keepdims=True)
    r = jax.random.uniform(key, (bsz, 1))
    r = r ** jnp.exp(-p.skew)[:, None]
    r = r * 0.9998 * s_final
    cdf = jnp.cumsum(sp, axis=-1)
    chosen = jnp.sum((cdf < r).astype(jnp.int32), axis=-1)
    chosen = jnp.minimum(chosen, v - 1)
    tokens = jnp.take_along_axis(si, chosen[:, None], axis=-1)[:, 0]
    qf = sp / jnp.maximum(s_final, _EPS)
    chosen_p = jnp.take_along_axis(qf, chosen[:, None], axis=-1)[:, 0]

    # mirostat mu update (sampling.cpp:722-745)
    surprise = -jnp.log2(jnp.maximum(chosen_p, _EPS))
    new_mu = jnp.where(p.mirostat,
                       mu + p.mirostat_eta * (p.mirostat_tau - surprise),
                       p.mirostat_mu)

    if return_top > 0:
        neg_q, ti = jax.lax.sort_key_val(-qf, si, dimension=-1)
        return (tokens.astype(jnp.int32), chosen_p, new_mu,
                -neg_q[:, :return_top], ti[:, :return_top])
    return tokens.astype(jnp.int32), chosen_p, new_mu
