import sys
sys.path.insert(0, ".")
import numpy as np
from ydorbslam_tpu.config import load_config
from ydorbslam_tpu.io.tum import TumRgbdDataset
from ydorbslam_tpu.slam.system import SlamSystem, Sensor

cfg = load_config("/tmp/orbit_tum/TUM1_warped.yaml")
ds = TumRgbdDataset("/tmp/orbit_tum", "/tmp/orbit_tum/assoc.txt",
                    depth_map_factor=cfg.depth.depth_map_factor,
                    is_rgb=cfg.camera.is_rgb)
sys_ = SlamSystem(cfg, Sensor.RGBD, enable_loop_closing=False)
sys_.enable_pipelined(lag=8)
sys_.precompile()

orig = sys_._drain_one
ctr = [0]
def spy(ts, info, allow_reloc=True):
    print("drain", ctr[0], "mode", info.mode, "ok", int(info.ok), "inl", info.n_inliers, "need_kf", int(info.need_kf), flush=True)
    ctr[0] += 1
    return orig(ts, info, allow_reloc)
sys_._drain_one = spy
for i in range(170):
    t, g, d = ds[i]
    sys_.track_rgbd_pipelined(t, g, d)
sys_.flush_pipeline()
print("kfs", sys_.n_keyframes)
d2 = sys_.run_stats()
print({k: d2[k] for k in ("frames_total", "frames_lost", "relocalizations_attempted", "relocalizations_succeeded", "keyframes_inserted")})
