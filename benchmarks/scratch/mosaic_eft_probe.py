"""Mosaic (real-TPU pallas) EFT exactness probe: two_sum/two_prod and the
acc_step chain inside a compiled kernel vs f64, printed as violation
counts. Diagnoses whether Mosaic preserves IEEE semantics for df32."""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
import jax, numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from sextans_tpu.ops.df32 import two_sum, two_prod, acc_step, compensated_epilogue

rng = np.random.default_rng(0)
a = (rng.standard_normal((8,128)) * 10.0 ** rng.integers(-6, 6, (8,128)).astype(np.float64)).astype(np.float32)
b = (rng.standard_normal((8,128)) * 10.0 ** rng.integers(-6, 6, (8,128)).astype(np.float64)).astype(np.float32)

def kern(a_ref, b_ref, s_ref, e_ref, p_ref, pe_ref):
    s, e = two_sum(a_ref[...], b_ref[...])
    p, pe = two_prod(a_ref[...], b_ref[...])
    s_ref[...] = s; e_ref[...] = e; p_ref[...] = p; pe_ref[...] = pe

s, e, p, pe = pl.pallas_call(kern, out_shape=[jax.ShapeDtypeStruct((8,128), jnp.float32)]*4)(a, b)
v1 = np.abs((np.asarray(s).astype(np.float64)+np.asarray(e).astype(np.float64)) - (a.astype(np.float64)+b.astype(np.float64)))
v2 = np.abs((np.asarray(p).astype(np.float64)+np.asarray(pe).astype(np.float64)) - (a.astype(np.float64)*b.astype(np.float64)))
print("mosaic two_sum violations:", int((v1>0).sum()), v1.max(), flush=True)
print("mosaic two_prod violations:", int((v2>0).sum()), v2.max(), flush=True)
print("mosaic add == numpy mismatches:", int((np.asarray(s) != (a+b)).sum()), flush=True)
print("mosaic mul == numpy mismatches:", int((np.asarray(p) != (a*b)).sum()), flush=True)

def kern2(v_ref, b_ref, out_ref):
    def body(j, carry):
        acc, comp = carry
        p, pe = two_prod(v_ref[pl.ds(j,1), :], b_ref[pl.ds(j,1), :])
        acc, comp = acc_step(acc, comp, p, pe)
        return acc, comp
    acc, comp = jax.lax.fori_loop(0, 64, body, (jnp.zeros((1,128), jnp.float32), jnp.zeros((1,128), jnp.float32)))
    out_ref[...] = compensated_epilogue(jnp.float32(1.0), acc, comp)
v = rng.standard_normal((64,128)).astype(np.float32)
bb = rng.standard_normal((64,128)).astype(np.float32)
out = pl.pallas_call(kern2, out_shape=jax.ShapeDtypeStruct((1,128), jnp.float32))(v, bb)
exact = (v.astype(np.float64)*bb.astype(np.float64)).sum(0)
err = np.abs(np.asarray(out)[0].astype(np.float64) - exact)
floor = np.abs(exact.astype(np.float32).astype(np.float64) - exact)
print("mosaic chain: excess over floor:", (err - floor).max(), " n_above:", int((err>floor+1e-12).sum()), flush=True)
