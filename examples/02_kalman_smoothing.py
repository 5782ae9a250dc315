"""Linear Gaussian state-space smoothing — the reference's headline benchmark
model, solved exactly by an associative-scan Kalman block."""
import _common  # noqa: F401
import numpy as np

import rxinfer_tpu as rx

T, d = 400, 2
theta = np.pi / 40
A = np.array([[np.cos(theta), -np.sin(theta)],
              [np.sin(theta), np.cos(theta)]], np.float32)
Q = 0.05 * np.eye(d, dtype=np.float32)
R = 1.0 * np.eye(d, dtype=np.float32)
m0 = np.zeros(d, np.float32)
V0 = 25.0 * np.eye(d, dtype=np.float32)

rng = np.random.default_rng(0)
x_true = np.zeros((T, d), np.float32)
for t in range(1, T):
    x_true[t] = A @ x_true[t - 1] + rng.multivariate_normal(np.zeros(d), Q)
y_obs = (x_true + rng.multivariate_normal(np.zeros(d), R, size=T)).astype(np.float32)


@rx.model
def lgssm(y):
    x = rx.latent(T, name="x")
    x[0] = rx.MvNormal(mean=m0, cov=V0)
    for t in rx.plate(1, T):
        x[t] = rx.MvNormal(mean=A @ x[t - 1], cov=Q)
    for t in rx.plate(T):
        y[t] = rx.MvNormal(mean=x[t], cov=R)
    return {"x": x}


res = rx.infer(model=lgssm, data={"y": y_obs}, free_energy=True)
means = np.asarray(res.posteriors["x"].mean())
rmse_raw = float(np.sqrt(((y_obs - x_true) ** 2).mean()))
rmse_smooth = float(np.sqrt(((means - x_true) ** 2).mean()))
print(f"observation RMSE {rmse_raw:.3f} -> smoothed RMSE {rmse_smooth:.3f}")
print(f"-log evidence = {float(np.asarray(res.free_energy)[-1]):.2f}")
