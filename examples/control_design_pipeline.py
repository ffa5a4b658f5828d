"""End-to-end example: classical control/DSP design, all inside tpufft.

One pipeline touching the round-5 surface:
1. `place_poles` — stabilize a double integrator by state feedback,
2. `cont2discrete` — discretize the closed loop (zero-order hold),
3. `dlsim` — simulate it (jax input runs the state recurrence as an
   O(log n)-depth associative scan on device),
4. `gammatone` + `lfilter` — an auditory filterbank analysis of the
   response (the order-8 IIR rides the stable SOS routing),
5. `find_peaks` / `find_peaks_cwt` — locate the response's resonances
   from its Welch PSD.

Run:  python examples/control_design_pipeline.py    (any backend)
"""

import numpy as np

import jax.numpy as jnp

import tpufft

# -- 1. pole placement on the double integrator ---------------------------
A = np.array([[0.0, 1.0], [0.0, 0.0]])
B = np.array([[0.0], [1.0]])
fsf = tpufft.place_poles(A, B, [-2.0 + 2.0j, -2.0 - 2.0j])
Acl = A - B @ fsf.gain_matrix
print("closed-loop poles:", np.sort_complex(fsf.computed_poles))

# -- 2/3. discretize and simulate a noisy step on device ------------------
fs = 200.0
sysd = tpufft.cont2discrete((Acl, B, np.array([[1.0, 0.0]]),
                             np.zeros((1, 1))), 1 / fs, method="zoh")
rng = np.random.default_rng(0)
u = np.ones(1024) + 0.05 * rng.standard_normal(1024)
tout, y, _ = tpufft.dlsim(sysd, jnp.asarray(u.astype(np.float32)))
y = np.asarray(y)[:, 0]
print(f"step response: settles to {y[-50:].mean():.4f} "
      f"(DC gain {1 / 8:.4f} expected)")

# -- 4. gammatone filterbank over the response -----------------------------
energies = []
for cf in (2.0, 10.0, 40.0):
    b, a = tpufft.gammatone(cf, "iir", fs=fs)
    band = tpufft.lfilter(b, a, y - y.mean())
    energies.append(float(np.sum(np.square(np.asarray(band)))))
print("gammatone band energies (2/10/40 Hz):",
      [f"{e:.3g}" for e in energies])

# -- 5. find the resonance in the PSD --------------------------------------
f, p = tpufft.welch(y - y.mean(), fs=fs, nperseg=256)
pk, props = tpufft.find_peaks(np.asarray(p), prominence=np.max(p) / 20)
pk_cwt = tpufft.find_peaks_cwt(np.asarray(p), np.arange(1, 6))
print("find_peaks resonances at Hz:", np.asarray(f)[pk].round(2))
print("find_peaks_cwt agrees near:", np.asarray(f)[pk_cwt][:4].round(2))
