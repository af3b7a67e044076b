import sys, time, os, shutil
sys.path.insert(0, "/root/repo")
import numpy as np
import schwarzwald_tpu
from schwarzwald_tpu.core.pointbuffer import PointBuffer
from schwarzwald_tpu.core.aabb import AABB
from schwarzwald_tpu.io import las
from schwarzwald_tpu.process.tiler_process import TilerArguments, TilerProcess

NB, NP = 4, 400_000
src_dir, out = "/tmp/uni4m_src", "/tmp/uni4m_out"
shutil.rmtree(out, ignore_errors=True)
t0 = time.perf_counter()
TilerProcess(TilerArguments(
    sources=[f"{src_dir}/b{i}.las" for i in range(NB)],
    output_directory=out, internal_cache_size=NP, diagonal_fraction=250,
)).run()
dt = time.perf_counter() - t0
print(f"uniform {NB*NP//1000}k/{NB}-batch: {dt:.1f}s  {NB*NP/dt/1e6:.3f} Mpts/s")
