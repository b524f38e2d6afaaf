import sys, time, numpy as np, jax, jax.numpy as jnp
import waveform_tpu.kernels.exact_pallas as ep
N = int(sys.argv[1]); BS = [int(b) for b in sys.argv[2].split(",")]
from waveform_tpu import AudioInfo, Settings, resolve
from waveform_tpu.core.enums import FFTWindow, InterpMode
from waveform_tpu.dsp.devring import init_ring, push
from waveform_tpu.dsp.spectrum import display_decibels, init_state, make_spectrum_step
from waveform_tpu.rebin.apply import make_rebin_fn

S, SR, T = 256 if N <= 4096 else 64, 48000, 32
cfg = resolve(Settings(fft_size=N, width=800, window=FFTWindow.HANN,
                       interp_mode=InterpMode.LANCZOS, enable_large_fft=True),
              AudioInfo(SR, 2))
rebin = make_rebin_fn(cfg, apply_pixel_map=False)
hop = int(SR / cfg.fps)
dt = jnp.float32(1/60); active = jnp.ones(S, bool); rms = jnp.zeros(S, jnp.float32)
key = jax.random.key(0)

def build(bs):
    ep._block_streams = lambda n: bs
    try:
        ep.rfft_pair_mag_packed.clear_cache()
    except Exception:
        pass
    step = make_spectrum_step(cfg)
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
    fn = jax.jit(disp)
    ring = init_ring(S, 2, N); state = init_state(cfg, S)
    (r2, s2), s = fn(key, ring, state)
    jax.block_until_ready(s)
    print("built bs", bs, flush=True)
    return fn, ring, state

progs = {}
for bs in BS:
    try:
        progs[bs] = build(bs)
    except Exception as e:
        print(f"bs={bs}: FAIL {str(e)[:100]}")
res = {b: [] for b in progs}
for rnd in range(5):
    for b, (fn, ring, state) in progs.items():
        t0 = time.perf_counter()
        for i in range(10):
            _, s = fn(jax.random.fold_in(key, 100+rnd*10+i), ring, state)
        jax.block_until_ready(s)
        res[b].append((time.perf_counter()-t0)/(10*T)*1e6)
for b, a in res.items():
    print(f"N={N} bs={b}: min {min(a):.1f} us/tick")
