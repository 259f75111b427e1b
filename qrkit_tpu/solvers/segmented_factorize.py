"""Fused factorize program builder for the segmented banded solver.

The whole pipeline — panel/slab extraction, phase-1 segment chains (Pallas
kernel or vmapped XLA scan), lane-major slab Q\u1d40, bottom-row cut, CAQR
compression, boundary chain, health probe — compiles to ONE program per plan
(pinned at 1 dispatch by tests/test_dispatch_count.py).  Split from
segmented_banded.py (round 4); `self` is the SegmentedBandedQR instance.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.compact_wy import TwoSegmentWYSeq
from ..ops.householder import highest_precision, panel_qr_yt_soa
from .base import _diag_health
from .banded_blocked import _banded_factorize_chunk
from .segmented_apply import _apply_cols_split, _segment_apply_cols


@functools.partial(jax.jit, static_argnames=("max_carry", "max_emit"))
def _vmapped_chain(C0, shifted, col_inc, active, **kw):
    """vmap of the banded scan chunk over the segment axis."""
    f = lambda c, s, ci, a: _banded_factorize_chunk(c, s, ci, a, **kw)
    return jax.vmap(f)(C0, shifted, col_inc, active)


def build_factorize_fn(self, pallas_on: bool = False):
    """Per-plan jitted device pipeline: segment chains (fused Pallas
    kernel or vmapped XLA scan) → lane-major slab Qᵀ → CAQR-compressed
    boundary chain.  Plan metadata (device-resident index/geometry
    arrays) is constant across the repeated factorizations of one
    structure (the LM pattern), so this compiles once per plan."""
    if (
        getattr(self, "_fac_fn", None) is not None
        and getattr(self, "_fac_mode", None) == pallas_on
    ):
        return self._fac_fn
    from .banded_blocked import _shift_panels, banded_factorize

    S, L, o = self.S, self.L, self._overlap
    max_cols, kw, ckw = self._max_cols, dict(self._kw), dict(self._chain_kw)
    nbot2 = self._nbot2
    nloc_max = self._nloc_max
    h1 = kw["max_carry"]

    # NOTE: every device array is a jit ARGUMENT, never a closure capture —
    # a captured device array becomes an MLIR constant, which jax
    # materializes on the HOST at trace time (a device→host fetch through
    # the tunnel) and bakes into the executable; empirically a program
    # carrying multi-MB baked constants also degrades EVERY subsequent
    # host→device transfer in the process ~100× (axon tunnel behavior)
    self._fac_meta = dict(
        carry_d=self._carry_d, nrows_d=self._nrows_d, starts=self._starts,
        colinc_d=self._colinc_d, carry2d=self._carry2d,
        active_d=self._active_d, rows2d=self._rows2d,
        top_valid=self._top_valid, bot_starts=self._bot_starts,
        bot_valid=self._bot_valid, chain_geom=self._chain_geom_dev,
        emit_d=self._emit_d, seg_col0=self._seg_col0_d,
        chain_cols=self._chain_solve_meta[0],
        chain_emit=self._chain_solve_meta[1],
    )
    pf, sf = self._panel_fast, self._slab_fast
    if pf is not None:
        self._fac_meta["panel_mask"] = pf["mask"]
        if pf["d0"]:
            self._fac_meta["panel_l0shift"] = pf["l0shift"]
    else:
        self._fac_meta["panel_gmap"] = self._panel_gmap
    if sf is not None:
        self._fac_meta["slab_lead_t"] = sf["lead_t"]
        self._fac_meta["slab_tail_t"] = sf["tail_t"]
    else:
        self._fac_meta["slab_gmap_t"] = self._slab_gmap_t
    if pallas_on:
        self._fac_meta["act_soa"] = self._act_soa
    p2w = getattr(self, "_p2w", None) if pallas_on else None
    if p2w is not None:
        self._fac_meta["p2w_feed"] = p2w["feed"]
        self._fac_meta["p2w_src"] = p2w["src"]
        self._fac_meta["p2w_ab"] = p2w["ab"]
    grouped = self._chain_regroup is not None
    chain_pl = self._chain_pallas if pallas_on else None
    if chain_pl is not None:
        self._fac_meta["chain_map_t"] = chain_pl["map"]
        self._fac_meta["chain_act"] = chain_pl["act"]
    if grouped:
        self._fac_meta["chain_regroup"] = self._chain_regroup
    p2u = self._p2_uniform
    nuni = self._p2_nuni
    p2s = getattr(self, "_p2_static", None) if p2u else None
    p2g = getattr(self, "_p2_gen_static", None) if p2u else None
    if p2u:
        self._fac_meta["s1u"] = self._s1u
        self._fac_meta["s2u"] = self._s2u
        self._fac_meta["spu"] = self._spu

    mR = self._mRloc
    ew = mR * max_cols
    need = S * L * ew

    if pf is not None:
        d0 = pf["d0"]

        def _extract_panels(pad, meta):
            # gather-free: the data vector IS the panel tensor up to a
            # boolean mask (and one static slice for the shifted first
            # panels of segments 1..); see _detect_panel_fast
            data = pad[:-1]
            flat = (
                jnp.concatenate(
                    [data, jnp.zeros((need - data.shape[0],), data.dtype)]
                )
                if data.shape[0] < need
                else data[:need]
            )
            base = jnp.where(
                meta["panel_mask"],
                flat.reshape(S * L, mR, max_cols),
                jnp.zeros((), data.dtype),
            )
            if d0:
                seg = flat.reshape(S, L * ew)
                l0 = jax.lax.slice(seg, (0, d0), (S, d0 + ew)).reshape(
                    S, mR, max_cols
                )
                bs = base.reshape(S, L, mR, max_cols)
                m0 = meta["panel_mask"].reshape(S, L, mR, max_cols)[:, 0]
                sel = meta["panel_l0shift"][:, None, None] & m0
                l0 = jnp.where(sel, l0, bs[:, 0])
                base = bs.at[:, 0].set(l0).reshape(S * L, mR, max_cols)
            return base

    else:

        def _extract_panels(pad, meta):
            return pad[meta["panel_gmap"]]  # [S*L, mR, max_cols]

    if sf is not None:
        w_, mid = sf["w"], self._max_seg_rows - 2 * sf["w"]

        def _extract_slab(pad, meta):
            lead = pad[meta["slab_lead_t"]]
            tail = pad[meta["slab_tail_t"]]
            return jnp.concatenate(
                [lead, jnp.zeros((S, 2 * o, mid), pad.dtype), tail], axis=2
            )

    else:

        def _extract_slab(pad, meta):
            return pad[meta["slab_gmap_t"]]

    def _phase1_xla(pad, meta):
        pj = _extract_panels(pad, meta)  # [S*L, mR, max_cols]
        shifted = _shift_panels(
            pj, meta["carry_d"], meta["nrows_d"], kw["max_active"]
        ).reshape(S, L, kw["max_active"], max_cols)
        C0 = jnp.zeros((S, kw["max_carry"], max_cols), pad.dtype)
        _, (Yws, Ts, Vs) = _vmapped_chain(
            C0, shifted, meta["colinc_d"], meta["active_d"],
            max_carry=kw["max_carry"], max_emit=kw["max_emit"],
        )
        return Yws, Ts, Vs, None

    merged_on = False
    if pallas_on:
        from ..ops.householder import build_t_factor
        from ..ops.pallas_banded import pallas_segment_chains_soa

        ci_body, ci0_rest = self._pallas_ci
        ma, mca, me = kw["max_active"], kw["max_carry"], kw["max_emit"]
        interp = self._pallas_interpret
        npad = self._pallas_npad

        # Merged gather-free extract+shift (round 5): the rank-3
        # [S*L, mR, mc] panel tensor has an mc ≪ 128 minor dim, so both the
        # masked extraction and the take_along_axis row shift run 16×
        # lane-padded (measured 0.59 + 0.42 ms of the 3.99 ms config-3
        # refactorize).  When the per-step carry is CONSTANT across active
        # segments (every uniform interior geometry — the tail steps where
        # carry reads 0 are inactive and their panels mask to zero anyway),
        # the shift is a static pad+slice: keep the panels merged as
        # [S, L, mR*mc] (minor dim ≥ 128, no physical padding) and take one
        # lax.slice per DISTINCT carry value, selecting per step.  No
        # gather, no rank-3 intermediate.
        sst = None
        if pf is not None and not getattr(self, "_disable_merged_extract", False):
            cr_h = np.asarray(self._loc_geom["carry_rows"])
            act_h = np.asarray(self._active)
            vals = []
            for l in range(L):
                u = np.unique(cr_h[:, l][act_h[:, l]])
                if u.size > 1:
                    vals = None
                    break
                vals.append(int(u[0]) if u.size else 0)
            if vals is not None and len(set(vals)) <= 4:
                sst = vals
                merged_on = True
        if sst is not None:
            d0_m = pf["d0"]
            ew_m = ew
            emc = ma * max_cols
            _starts_m = [(h1 - c) * max_cols for c in sst]
            _endpad_m = max(
                0, max(st + emc for st in _starts_m) - (h1 * max_cols + ew_m)
            )

            def _base_merged(pad, meta):
                data = pad[:-1]
                flat = (
                    jnp.concatenate(
                        [data, jnp.zeros((need - data.shape[0],), data.dtype)]
                    )
                    if data.shape[0] < need
                    else data[:need]
                )
                maskm = meta["panel_mask"].reshape(S * L, ew_m)
                base = jnp.where(
                    maskm, flat.reshape(S * L, ew_m), jnp.zeros((), data.dtype)
                ).reshape(S, L, ew_m)
                if d0_m:
                    seg = flat.reshape(S, L * ew_m)
                    l0 = jax.lax.slice(seg, (0, d0_m), (S, d0_m + ew_m))
                    m0 = maskm.reshape(S, L, ew_m)[:, 0]
                    sel = meta["panel_l0shift"][:, None] & m0
                    base = base.at[:, 0].set(jnp.where(sel, l0, base[:, 0]))
                return base

            def _shifted_merged(base):
                parts = [jnp.zeros((S, L, h1 * max_cols), base.dtype), base]
                if _endpad_m:
                    parts.append(jnp.zeros((S, L, _endpad_m), base.dtype))
                big = jnp.concatenate(parts, axis=2)
                uniq = sorted(set(_starts_m))
                slabs = {
                    v: jax.lax.slice(big, (0, 0, v), (S, L, v + emc))
                    for v in uniq
                }
                out = slabs[uniq[0]]
                st_arr = np.asarray(_starts_m)
                for v in uniq[1:]:
                    mask_l = jnp.asarray(st_arr == v)[None, :, None]
                    out = jnp.where(mask_l, slabs[v], out)
                return out

        def _phase1(pad, meta, upto=None):
            if sst is not None:
                base = _base_merged(pad, meta)
                if upto == "panels":
                    return jnp.sum(base)
                shifted = _shifted_merged(base)
                if upto == "shift":
                    return jnp.sum(shifted)
            else:
                pj = _extract_panels(pad, meta)  # [S*L, mR, max_cols]
                if upto == "panels":
                    return jnp.sum(pj)
                shifted = _shift_panels(
                    pj, meta["carry_d"], meta["nrows_d"], ma
                ).reshape(S, L, ma * max_cols)
                if upto == "shift":
                    return jnp.sum(shifted)
            # SoA relayout as ONE dense transpose on device — a
            # [L, ma*mc, npad] element gather map was measured at 72 ms
            # for a 625k-lane case where the panel bytes themselves are
            # ~7 ms of HBM traffic
            soa = jnp.moveaxis(shifted, 0, -1)  # [L, ma*mc, S]
            soa = jnp.pad(soa, ((0, 0), (0, 0), (0, npad - S)))
            if upto == "soatr":
                return jnp.sum(soa)
            y_soa, tau_soa, v_soa = pallas_segment_chains_soa(
                soa, meta["act_soa"], ma=ma, mc=max_cols, mca=mca,
                me=me, ci=ci_body, ci0_rest=ci0_rest, interpret=interp,
            )
            if upto == "kernel":
                return (
                    jnp.sum(v_soa)
                    + jnp.sum(y_soa[0, 0])
                    + jnp.sum(tau_soa[0, 0])
                )
            Yws = jnp.moveaxis(y_soa[:, :, :S], -1, 0).reshape(
                S, L, ma, max_cols
            )
            taus = jnp.moveaxis(tau_soa[:, :, :S], -1, 0)  # [S, L, mc]
            Vs = jnp.moveaxis(v_soa[:, :, :S], -1, 0).reshape(
                S, L, me, max_cols
            )
            Ts = jax.vmap(jax.vmap(build_t_factor))(Yws, taus)
            return Yws, Ts, Vs, (y_soa, tau_soa)

    else:
        _phase1 = _phase1_xla

    if p2w is not None:
        from .segmented_apply import _segment_apply_cols_stream
        from ..ops.pallas_banded import pallas_segment_apply_w

        p2w_st = p2w["statics"]
        excl_static = p2w["excl_static"]
        npad_w = self._pallas_npad
        ko_w = p2w_st["ko"]
        ma_w = p2w_st["ma"]
        Rr = int(self._max_seg_rows)

        def _fused_slab(soa, slab_t, Yws, Ts, meta):
            """qt_slab via the fused Pallas chain apply: feed each step's
            first-touch pristine slab rows with ONE shared row gather
            (host-built maps, segmented_plan.prepare_p2w), run the
            reflector chains with the live region position-indexed in
            VMEM, compose the result from the last-writer emissions with
            a second shared row gather.  Replaces the per-step XLA window
            apply (`p2slab`, 6.9 of the 9.9 ms config-3 refactorize —
            BANDED_PERF.md); the shared maps replaced a per-segment
            element-gather formulation whose feed/compose cost 10 + 6.4 ms
            against the kernel's 0.85 ms.  Generic segments (0 and the
            irregular tail) keep the XLA stream and overwrite their lanes."""
            y_soa, tau_soa = soa
            dt = slab_t.dtype
            kg_w = p2w_st["kg"]
            ncg = ko_w // kg_w
            padr = p2w_st["padr"]
            slab_T = jnp.transpose(slab_t, (2, 1, 0))  # [Rr, ko, S]
            slab_pad = jnp.concatenate(
                [slab_T, jnp.zeros((padr - Rr, ko_w, S), dt)], axis=0
            )
            # feed: [L, A] shared slab-row indices (sentinel -> zero pad row)
            fed = jnp.take(
                slab_pad, meta["p2w_feed"].reshape(-1), axis=0
            )  # [L*A, ko, S]
            w = jnp.transpose(
                fed.reshape(L, ma_w, ncg, kg_w, S), (0, 2, 1, 3, 4)
            ).reshape(L, ncg, ma_w * kg_w, S)
            w_soa = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, npad_w - S)))
            wq = pallas_segment_apply_w(
                y_soa, tau_soa, w_soa, meta["p2w_ab"],
                ma=ma_w, mc=p2w_st["mc"], mca=p2w_st["mca"], ko=ko_w,
                kg=kg_w, h=p2w_st["h"], wrows=p2w_st["wrows"],
                interpret=interp,
            )  # [L, ncg, ma*kg, npad]
            er = jnp.transpose(
                wq[:, :, :, :S].reshape(L, ncg, ma_w, kg_w, S),
                (0, 2, 1, 3, 4),
            ).reshape(L * ma_w, ko_w, S)
            er = jnp.concatenate([er, jnp.zeros((1, ko_w, S), dt)], axis=0)
            srcm = meta["p2w_src"]  # [Rr] shared, sentinel L*ma -> pristine
            gathered = jnp.take(er, srcm, axis=0)  # [Rr, ko, S]
            qt_t = jnp.where(
                (srcm == L * ma_w)[:, None, None], slab_T, gathered
            )
            qt = jnp.transpose(qt_t, (2, 1, 0))
            for s_x, (s1x, s2x, spx) in excl_static.items():
                nx = len(s1x)
                ox = _segment_apply_cols_stream(
                    Yws[s_x : s_x + 1, :nx], Ts[s_x : s_x + 1, :nx],
                    s1x, s2x, spx, slab_t[s_x : s_x + 1], True,
                )
                qt = qt.at[s_x].set(ox[0])
            return qt

    rbm = self._rbot_max
    ncols_total, m1 = self.cols, self._m1
    chk = self._health_check_zero_pivot

    def _health(Vs, chain_r, meta):
        # info()'s health probe, folded into the factorize program (the
        # eager r_diagonal assembly cost ~40 tiny dispatches per
        # refactorize through the accelerator tunnel) — same scatter as
        # :meth:`r_diagonal`, on the pre-moveaxis [S, L, me, mc] panels
        d = jnp.diagonal(Vs, axis1=2, axis2=3)  # [S, L, k]
        j = jnp.arange(d.shape[2])
        pos = (
            meta["seg_col0"][:, None, None]
            + meta["starts"][:, :, None]
            + j[None, None, :]
        )
        valid = (j[None, None, :] < meta["emit_d"][:, :, None]) & meta[
            "active_d"
        ][:, :, None]
        idx = jnp.where(valid, pos, ncols_total)
        out = jnp.zeros((ncols_total,), d.dtype).at[idx].set(d, mode="drop")
        d2 = jnp.diagonal(chain_r, axis1=1, axis2=2)
        j2 = jnp.arange(d2.shape[1])
        pos2 = m1 + meta["chain_cols"].astype(jnp.int32)[:, None] + j2[None, :]
        valid2 = j2[None, :] < meta["chain_emit"][:, None]
        out = out.at[jnp.where(valid2, pos2, ncols_total)].set(d2, mode="drop")
        return _diag_health(out, check_zero=chk)

    # `upto` truncates the program after a stage (returning a scalar probe
    # of that stage's outputs) so the per-stage latency budget can be timed
    # on hardware without duplicating the pipeline — see
    # examples/profile_segmented.py and BANDED_PERF.md.  Default "all" is the
    # production program; call sites never pass it.  The "qtslab" and
    # "botarr" probes return FULL ARRAYS for numeric debugging — never use
    # them in the tunnel timing harness (each fetch is a multi-MB transfer,
    # ~31 ms+); the timing probes are the scalar ones ("extract", "phase1",
    # "p2slab", "caqr", "chain").
    @functools.partial(jax.jit, static_argnames=("upto",))
    def fac(data, meta, upto="all"):
        dtype = data.dtype
        pad = jnp.concatenate([data, jnp.zeros((1,), dtype)])
        slab_t = _extract_slab(pad, meta)  # [S, 2o, seg_rows(pad)] lane-major
        if upto == "extract":
            if pallas_on and merged_on:
                # measure the production merged panel base, not the legacy
                # rank-3 extraction (dead code when the merged path is on)
                return _phase1(pad, meta, upto="panels") + jnp.sum(slab_t)
            return jnp.sum(_extract_panels(pad, meta)) + jnp.sum(slab_t)
        if pallas_on and upto in ("panels", "shift", "soatr", "kernel"):
            # phase-1 sub-stage probes (Pallas mode only): each is a true
            # prefix of the pipeline; keep the slab gather live like the
            # main probes so cumulatives stay monotone
            return _phase1(pad, meta, upto=upto) + jnp.sum(slab_t)
        Yws, Ts, Vs, soa = _phase1(pad, meta)
        if upto == "phase1":
            # keep slab extraction live (jnp.sum(slab_t)) so this probe is a
            # true prefix of the pipeline — without it XLA DCEs the slab
            # gather and the "extract" cumulative reads HIGHER than "phase1"
            return jnp.sum(Vs) + jnp.sum(Yws[0, 0]) + jnp.sum(slab_t)
        if p2w is not None:
            qt_slab = _fused_slab(soa, slab_t, Yws, Ts, meta)
        elif p2u:
            qt_slab = _apply_cols_split(
                Yws, Ts, meta, slab_t, h1, True, nuni, p2s, p2g
            )
        else:
            qt_slab = _segment_apply_cols(
                Yws, Ts, meta["starts"], meta["rows2d"], meta["carry2d"],
                slab_t, h1, True,
            )
        if upto == "qtslab":
            return qt_slab
        # stored LANE-MAJOR [S, 2o, nloc]: the AoS [S, nloc, 2o] form is
        # 128/(2o)-fold lane-padded (61 MB effective at 20k blocks), and
        # qt_slab is already lane-major so no transpose is needed at all
        j2_top = jnp.where(
            meta["top_valid"][:, None, :],
            qt_slab[:, :, :nloc_max],
            jnp.zeros((), dtype),
        )
        # bottom rows cut straight from the LANE-MAJOR slab: an AoS
        # [S, rbot, 2o] bot is 128/(2o)-fold lane-padded and the vmapped
        # per-segment QR paid that on every column pass (37 ms of the
        # 20k-block factorize); instead keep rows in lanes and run the
        # batched SoA panel QR with the segment axis in lanes.  Each
        # segment's bottom rows are a CONTIGUOUS run starting at its
        # local column count (by construction, _prepare_segmentation), so
        # the cut is one batched dynamic_slice — the take_along_axis
        # element gather here was 28 ms of the 20k-block factorize.
        qs_pad = jnp.concatenate(
            [qt_slab, jnp.zeros((S, 2 * o, rbm), dtype)], axis=2
        )
        bot = jax.vmap(
            lambda sl, st: jax.lax.dynamic_slice(
                sl, (jnp.zeros((), st.dtype), st), (2 * o, rbm)
            )
        )(qs_pad, meta["bot_starts"])  # [S, 2o, rbot_max]
        bot = jnp.where(meta["bot_valid"][:, None, :], bot, jnp.zeros((), dtype))
        # chain block 0 has no leading boundary: its local columns are the
        # trailing slab columns (the wrapped leading part is zero)
        bot = bot.at[0].set(jnp.roll(bot[0], -o, axis=0))
        if upto == "botarr":
            return bot
        if upto == "p2slab":
            return jnp.sum(qt_slab) + jnp.sum(bot)
        bot_soa = jnp.transpose(bot, (2, 1, 0))  # [rbot, 2o, S]
        # CAQR compression: ONE batched SoA QR reduces each [rbot, 2o]
        # slab to its [2o, 2o] R factor — batch-parallel (and
        # shard-parallel) — so the sequential boundary chain runs over
        # tiny factors.  Yb stays SoA ([rbot, 2o, S], segments in lanes):
        # the fused solve consumes it that way; protocol paths transpose.
        Yb, Tb_soa, Rb_top = panel_qr_yt_soa(bot_soa)
        Tb = jnp.transpose(Tb_soa, (2, 0, 1))  # [S, 2o, 2o] (small)
        comp = jnp.triu(jnp.transpose(Rb_top, (2, 0, 1)))
        if upto == "caqr":
            return jnp.sum(comp) + jnp.sum(Yb[0, 0]) + jnp.sum(Tb[0])
        if chain_pl is not None:
            # whole boundary chain in ONE kernel launch; the gather map
            # folds the regroup, the carry row shift, and the X-layout
            # transpose (see _chain_pallas at plan time)
            from ..ops.pallas_banded import pallas_chain_qr

            compf = jnp.concatenate(
                [comp.reshape(-1), jnp.zeros((1,), dtype)]
            )
            pant = compf[meta["chain_map_t"]]
            y_t, taus_c, v_t = pallas_chain_qr(
                pant, meta["chain_act"], **chain_pl["statics"],
                interpret=interp,
            )
            ncb = chain_pl["nb"]
            Ywc = jnp.swapaxes(y_t[:ncb], 1, 2)
            Tsc = jax.vmap(build_t_factor)(Ywc, taus_c[:ncb])
            chain_r = jnp.swapaxes(v_t[:ncb], 1, 2)
            cgd = meta["chain_geom"]
            chain_seq = TwoSegmentWYSeq(
                Ywc, Tsc, cgd["cols"].astype(jnp.int32),
                cgd["rows"].astype(jnp.int32),
                cgd["carry_rows"].astype(jnp.int32),
                h1=max(ckw["max_carry"], 1), m=nbot2,
            )
        else:
            if grouped:
                compf = jnp.concatenate(
                    [comp.reshape(-1), jnp.zeros((1,), dtype)]
                )
                pan = compf[meta["chain_regroup"]]
            else:
                pan = comp[..., : ckw["max_cols"]]
            chain_seq, chain_r = banded_factorize(
                pan, meta["chain_geom"], **ckw, m=nbot2
            )
        if upto == "chain":
            return jnp.sum(chain_r) + jnp.sum(chain_seq.Yf[0])
        # STORED factor layout is SoA ([L, ma, mc, S] / [L, mc, mc, S],
        # segment axis last): a jit OUTPUT gets the default tiled layout,
        # and the AoS [S, L, ma, mc] form with mc ≪ 128 minor is
        # ~(128/mc)-fold lane-padded in HBM — the factors are written
        # once per factorize and read by every solve, so the store/load
        # layout matters even though the in-program uses above keep
        # compiler-chosen internal layouts.  Consumers transpose back
        # inside their own jitted programs.
        return (
            jnp.moveaxis(Yws, 0, -1), jnp.moveaxis(Ts, 0, -1),
            jnp.moveaxis(Vs, 0, -1), j2_top, Yb, Tb, chain_seq, chain_r,
            _health(Vs, chain_r, meta),
        )

    self._fac_fn = fac
    self._fac_mode = pallas_on
    self._merged_extract = merged_on
    return fac

