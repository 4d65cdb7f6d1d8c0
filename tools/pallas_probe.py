"""Bisect which ops trigger 'Not implemented: Lane broadcast' in Mosaic."""

import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RS = 128
TPX = 256


def run(name, kernel, extra_scratch=()):
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((TPX, RS), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=list(extra_scratch),
        )(jnp.ones((TPX, RS), jnp.float32))
        out.block_until_ready()
        print(f"{name}: OK")
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        key = "Lane broadcast" if "Lane broadcast" in msg else msg.splitlines()[-1][:100]
        print(f"{name}: FAIL  [{key}]")


def k_repeat(x_ref, o_ref):
    col = jnp.sum(x_ref[:], axis=1, keepdims=True)  # (TPX,1)
    o_ref[:] = pltpu.repeat(col, repeats=RS, axis=1)


def k_mul_bcast(x_ref, o_ref):
    col = jnp.sum(x_ref[:], axis=1, keepdims=True)
    o_ref[:] = col * x_ref[:]  # implicit (TPX,1)*(TPX,RS)


def k_dot_bcast(x_ref, o_ref):
    col = jnp.sum(x_ref[:], axis=1, keepdims=True)
    ones = jnp.ones((1, RS), jnp.float32)
    o_ref[:] = jax.lax.dot_general(
        col, ones, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def k_row_bcast(x_ref, o_ref):
    row = jnp.sum(x_ref[:], axis=0, keepdims=True)  # (1,RS)
    o_ref[:] = row * x_ref[:]


def k_roll(x_ref, o_ref):
    o_ref[:] = pltpu.roll(x_ref[:], 4, axis=1)


def k_concat_lanes(x_ref, o_ref):
    col = jnp.sum(x_ref[:], axis=1, keepdims=True)
    cat = jnp.concatenate([col, col, col], axis=1)  # (TPX, 3)
    o_ref[:] = jnp.pad(cat, ((0, 0), (0, RS - 3)))


def k_lane_slice1(x_ref, o_ref):
    col = x_ref[:, 0:1]
    o_ref[:] = x_ref[:] + jnp.sum(col)


def k_min_scalar(x_ref, o_ref):
    s = jnp.min(x_ref[:])
    o_ref[:] = x_ref[:] + s


def k_scan_fwd(x_ref, o_ref):
    acc = x_ref[:]
    colidx = jax.lax.broadcasted_iota(jnp.int32, (TPX, RS), 1)
    s = 1
    while s < RS:
        rolled = pltpu.roll(acc, s, axis=1)
        acc = acc * jnp.where(colidx < s, 1.0, rolled)
        s *= 2
    o_ref[:] = acc


if __name__ == "__main__":
    run("row(1,RS) sublane bcast", k_row_bcast)
    run("repeat (TPX,1)->(TPX,RS)", k_repeat)
    run("mul implicit lane bcast", k_mul_bcast)
    run("dot_general K=1 outer", k_dot_bcast)
    run("pltpu.roll lanes", k_roll)
    run("concat width-1 lanes", k_concat_lanes)
    run("lane slice width 1", k_lane_slice1)
    run("reduce to scalar + add", k_min_scalar)
    run("hillis-steele lane scan", k_scan_fwd)
