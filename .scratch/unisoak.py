import sys, time, os, shutil
sys.path.insert(0, "/root/repo")
import numpy as np
import schwarzwald_tpu
from schwarzwald_tpu.core.pointbuffer import PointBuffer
from schwarzwald_tpu.core.aabb import AABB
from schwarzwald_tpu.io import las
from schwarzwald_tpu.process.tiler_process import TilerArguments, TilerProcess

NB, NP = 10, 400_000
src_dir, out = "/tmp/uni4m_src", "/tmp/uni4m_out"
if not os.path.isdir(src_dir) or len(os.listdir(src_dir)) != NB:
    shutil.rmtree(src_dir, ignore_errors=True); os.makedirs(src_dir)
    rng = np.random.default_rng(11)
    for i in range(NB):
        las.write_las(f"{src_dir}/b{i}.las",
                      PointBuffer(rng.uniform(1.0, 999.0, (NP, 3))),
                      AABB([0.]*3, [1000.]*3))
shutil.rmtree(out, ignore_errors=True)
t0 = time.perf_counter()
TilerProcess(TilerArguments(
    sources=[f"{src_dir}/b{i}.las" for i in range(NB)],
    output_directory=out, internal_cache_size=NP, diagonal_fraction=250,
)).run()
dt = time.perf_counter() - t0
print(f"uniform 4M/10-batch: {dt:.1f}s  {NB*NP/dt/1e6:.3f} Mpts/s")
