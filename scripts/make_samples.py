"""Regenerate outputs/samples/ (the counterpart of the reference's
committed outputs/point_cloud_outputs/ screenshots).

Runs the full pipeline on KITTI frame 0 (or reuses --npz from a prior
`--dump npz` run) and writes the disparity colormap, a 3D point-cloud
render (with the graphing.h-style range rings), and the top view."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import cv2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npz", default="", help="reuse a frame npz dump")
    ap.add_argument("--kitti", default="/root/reference/datasets/kitti_mini")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "outputs", "samples"))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    if args.npz:
        z = np.load(args.npz)
        dmap, pts = z["dmap"], z["points"]
    else:
        from stereovision_tpu.engine import StereoEngine
        W, H = 1242, 375
        calib = os.path.join(os.path.dirname(args.out), "..",
                             "stereovision_tpu", "data",
                             "kitti_2011_09_26.yml")
        eng = StereoEngine(os.path.abspath(calib), W, H)
        left = cv2.resize(cv2.imread(
            f"{args.kitti}/image_02/data/0000000000.png"), (W, H))
        right = cv2.resize(cv2.imread(
            f"{args.kitti}/image_03/data/0000000000.png"), (W, H))
        res = eng.process_frame(left, right, fetch="host")
        dmap, pts = np.asarray(res["dmap"]), np.asarray(res["points"])

    cv2.imwrite(os.path.join(args.out, "kitti_frame0_disparity.png"),
                cv2.applyColorMap(np.asarray(dmap), cv2.COLORMAP_JET))

    from stereovision_tpu.viz_live import PointCloudRenderer, Camera
    # the cloud is in the rectified camera frame (x right, y down,
    # z forward, quarter scale from the 4x display disparity through Q);
    # render from slightly above/behind the camera origin
    world = pts.reshape(-1, 3)
    r = PointCloudRenderer(960, 540, point_px=2)
    cam = Camera(x=0.0, y=-1.2, z=-2.5, pitch=0.18)
    cv2.imwrite(os.path.join(args.out, "kitti_frame0_pointcloud.png"),
                r.render(world, cam))

    from stereovision_tpu.viz import points_to_top_view
    cv2.imwrite(os.path.join(args.out, "kitti_frame0_topview.png"),
                np.asarray(points_to_top_view(world)))
    print("wrote 3 samples to", args.out)


if __name__ == "__main__":
    main()
