import os, sys, time, numpy as np
bs_override = int(sys.argv[1]) if len(sys.argv) > 1 else 0
import jax, jax.numpy as jnp
import waveform_tpu.kernels.exact_pallas as ep
if bs_override:
    ep._block_streams = lambda n: bs_override
from waveform_tpu import AudioInfo, Settings, resolve
from waveform_tpu.core.enums import FFTWindow, InterpMode
from waveform_tpu.dsp.devring import init_ring, push
from waveform_tpu.dsp.spectrum import display_decibels, init_state, make_spectrum_step
from waveform_tpu.rebin.apply import make_rebin_fn

S, N, SR, T = 256, 4096, 48000, 32
cfg = resolve(Settings(fft_size=N, width=800, window=FFTWindow.HANN,
                       interp_mode=InterpMode.LANCZOS, enable_large_fft=True),
              AudioInfo(SR, 2))
step = make_spectrum_step(cfg)
rebin = make_rebin_fn(cfg, apply_pixel_map=False)
hop = int(SR / cfg.fps)
dt = jnp.float32(1/60); active = jnp.ones(S, bool); rms = jnp.zeros(S, jnp.float32)
key = jax.random.key(0)

def disp(kk, ring, state):
    def b(carry, k):
        ring, state = carry
        bits = jax.random.bits(k, (S, 2, hop), jnp.uint32)
        new = bits.astype(jnp.float32) * jnp.float32(2.0**-32) - 0.5
        ring = push(ring, new, jnp.int32(hop))
        state = step(ring.buf, state, dt, active, rms)
        px = rebin(display_decibels(cfg, state))
        return (ring, state), px.mean()
    keys = jax.random.split(kk, T)
    return jax.lax.scan(b, (ring, state), keys)

fn = jax.jit(disp, donate_argnums=(1, 2))
ring = init_ring(S, 2, N); state = init_state(cfg, S)
for i in range(2):
    (ring, state), s = fn(jax.random.fold_in(key, i), ring, state)
jax.block_until_ready(s)
best = 1e9
for r in range(4):
    t0 = time.perf_counter()
    for i in range(10):
        (ring, state), s = fn(jax.random.fold_in(key, 100+r*10+i), ring, state)
    jax.block_until_ready(s)
    best = min(best, (time.perf_counter()-t0)/(10*T)*1e6)
tag = os.environ.get("WAVEFORM_TPU_EXACT_KERNEL", "auto")
print(f"kernel={tag} bs={bs_override or 'default'}: {best:.1f} us/tick")
