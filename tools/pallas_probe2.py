"""Bisect the actual blend kernel: strip pieces until it compiles."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RS = 128
TPX = 256
NTP = 16
L_AL = NTP * RS * 2
GRID_W = 4
WIDTH_PAD = 64


def make_kernel(level):
    def kernel(starts_ref, counts_ref, dims_ref, pair_tab_ref, mask_ref,
               rgb_ref, ed_ref, einv_ref, m_ref, apix_ref,
               buf_ref, m_scratch, apix_scratch, in_sem, out_sem):
        t = pl.program_id(0)
        start = starts_ref[t]
        count = counts_ref[t]
        width = dims_ref[0]
        height = dims_ref[1]
        num_tiles = dims_ref[2]
        bg = dims_ref[3].astype(jnp.float32)

        ty = t // GRID_W
        tx = t % GRID_W
        sub = jax.lax.broadcasted_iota(jnp.int32, (TPX, 1), 0)
        sub_full = jax.lax.broadcasted_iota(jnp.int32, (TPX, RS), 0)
        gx = tx * 16 + sub % 16
        gy = ty * 16 + sub // 16
        pxf = (tx * 16 + sub_full % 16).astype(jnp.float32)
        pyf = (ty * 16 + sub_full // 16).astype(jnp.float32)

        valid_px = (gx < width) & (gy < height) & (t < num_tiles) & (
            mask_ref[0] != 0
        )
        n_chunks = jnp.where(count > 0, pl.cdiv(count, RS), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, RS), 1)

        def cond(state):
            r, T, done, *_ = state
            all_done = jnp.min(done.astype(jnp.float32)) > 0.5
            return (r < n_chunks) & jnp.logical_not(all_done)

        def body(state):
            r, T, done, c_r, ed = state
            copy = pltpu.make_async_copy(
                pair_tab_ref.at[:, pl.ds(start + r * RS, RS)], buf_ref, in_sem
            )
            copy.start()
            copy.wait()
            xy_x = buf_ref[0:1, :]
            opa = buf_ref[5:6, :]
            dx = pxf - xy_x
            power = -0.5 * dx * dx
            alpha = jnp.minimum(0.99, opa * jnp.exp(power))
            if level >= 1:
                done_full = pltpu.repeat(done.astype(jnp.float32), RS, 1) > 0.5
                ok = (power <= 0.0) & (alpha >= 1 / 255.0) & ((r * RS + lane) < count) & ~done_full
            else:
                ok = alpha >= 1 / 255.0
            a0 = jnp.where(ok, alpha, 0.0)
            if level >= 2:
                col = jax.lax.broadcasted_iota(jnp.int32, (TPX, RS), 1)
                acc = 1.0 - a0
                s = 1
                while s < RS:
                    acc = acc * jnp.where(col < s, 1.0, pltpu.roll(acc, s, axis=1))
                    s *= 2
                cp_excl = jnp.where(col < 1, 1.0, pltpu.roll(acc, 1, axis=1))
                t_before = pltpu.repeat(T, RS, 1) * cp_excl
            else:
                t_before = 1.0 - a0
            w = a0 * t_before
            if level >= 3:
                trigger = ok & (t_before * (1.0 - alpha) < 1e-4)
                done = done | (jnp.max(trigger.astype(jnp.float32), axis=1, keepdims=True) > 0.5)
            c_r = c_r + jnp.sum(w, axis=1, keepdims=True)
            ed = ed + jnp.sum(w, axis=1, keepdims=True)
            if level >= 4:
                T = T * jnp.exp(jnp.sum(jnp.log(1.0 - a0), axis=1, keepdims=True))
            if level >= 5:
                m = jnp.max(w, axis=0, keepdims=True)
                cand = jnp.where((w >= m) & (m > 0.0), sub_full, jnp.int32(2**20))
                s_best = jnp.min(cand, axis=0, keepdims=True)
                s_best = jnp.where(m > 0.0, s_best, 0)
                apix = (ty * 16 + s_best // 16) * WIDTH_PAD + tx * 16 + s_best % 16
                m_scratch[:] = m
                apix_scratch[:] = apix
                mc = pltpu.make_async_copy(m_scratch, m_ref.at[:, pl.ds(start + r * RS, RS)], out_sem)
                mc.start(); mc.wait()
                ac = pltpu.make_async_copy(apix_scratch, apix_ref.at[:, pl.ds(start + r * RS, RS)], out_sem)
                ac.start(); ac.wait()
            return r + 1, T, done, c_r, ed

        T0 = jnp.ones((TPX, 1), jnp.float32)
        done0 = ~valid_px
        z0 = jnp.zeros((TPX, 1), jnp.float32)
        r, T, done, c_r, ed = jax.lax.while_loop(cond, body, (jnp.int32(0), T0, done0, z0, z0))

        if level >= 6:
            rgb = jnp.concatenate([
                jnp.where(valid_px, c_r + T * bg, 0.0),
                jnp.where(valid_px, c_r, 0.0),
                jnp.where(valid_px, c_r, 0.0),
            ], axis=1)
        else:
            rgb = jnp.concatenate([c_r, c_r, c_r], axis=1)
        rgb_ref[0] = rgb
        ed_ref[0] = jnp.where(valid_px, ed, 0.0)
        einv_ref[0] = ed
    return kernel


def try_level(level):
    starts = jnp.arange(NTP, dtype=jnp.int32) * RS
    counts = jnp.full(NTP, RS, jnp.int32)
    dims = jnp.array([64, 64, NTP, 1], jnp.int32)
    pair_tab = jnp.ones((16, L_AL), jnp.float32)
    mask = jnp.ones((NTP, TPX, 1), jnp.uint8)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(NTP,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, TPX, 1), lambda t, *_: (t, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, TPX, 3), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, TPX, 1), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, TPX, 1), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((16, RS), jnp.float32),
            pltpu.VMEM((1, RS), jnp.float32),
            pltpu.VMEM((1, RS), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((NTP, TPX, 3), jnp.float32),
        jax.ShapeDtypeStruct((NTP, TPX, 1), jnp.float32),
        jax.ShapeDtypeStruct((NTP, TPX, 1), jnp.float32),
        jax.ShapeDtypeStruct((1, L_AL), jnp.float32),
        jax.ShapeDtypeStruct((1, L_AL), jnp.int32),
    ]
    try:
        outs = pl.pallas_call(
            make_kernel(level),
            grid_spec=grid_spec,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(starts, counts, dims, pair_tab, mask)
        outs[0].block_until_ready()
        print(f"level {level}: OK")
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        key = [l for l in msg.splitlines() if "Not implemented" in l or "must be" in l or "Error" in l]
        print(f"level {level}: FAIL  {key[:1]}")


if __name__ == "__main__":
    for level in range(7):
        try_level(level)
