"""Measure the reference's CPU points/sec (train fwd+bwd) once.
Imports the reference code read-only; nothing is copied."""
import sys, time, torch
sys.path.insert(0, "/root/reference")
from models.PointNetpp.PointNetpp import PointNetpp
from Training.train_model import masked_onehot_cross_entropy

torch.manual_seed(0)
B, N, C = 8, 4096, 14
model = PointNetpp(part_classes=C)
opt = torch.optim.Adam(model.parameters(), lr=1e-3)
points = torch.randn(B, N, 9)
labels = torch.zeros(B, N, C); labels[..., 0] = 1
lengths = torch.full((B,), N, dtype=torch.int64)

def step():
    opt.zero_grad()
    out = model(points)
    loss = masked_onehot_cross_entropy(out, labels, lengths)
    loss.backward()
    opt.step()
    return float(loss)

step()  # warmup
times = []
for i in range(3):
    t0 = time.perf_counter()
    step()
    times.append(time.perf_counter() - t0)
    print(f"step {i}: {times[-1]:.2f}s", flush=True)
mean = sum(times)/len(times)
print(f"reference CPU PointNet++ train step: {mean:.2f}s -> {B*N/mean:.0f} points/sec", flush=True)
