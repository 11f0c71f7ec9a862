"""MultiPIE data preparation: landmark detection + index packaging.

Capability parity with /root/reference/tools/data_gen/multipie_get_lmk.py
(FAN landmarks over the image list) and multipie_orgnizedata.py:94-196
(package_data: id/illum/expression -> pose -> image-path indexes, the
uvtex -> pose-images map, and per-image aux info {lm68, s, R, t} from FAN
landmarks + template-keypoint weak-perspective fitting).

Two subcommands:
  get-lmk   images listed in a txt -> per-image ``<name>_lm68.npy``
  organize  label txt (+ optional uvtex/obj lists) -> the three pkl
            indexes the MultiPIE async datasets consume

Host-side tooling — no TPU involvement.  Uses our flax FAN
(models/face_alignment.py) and core/all3dtrans/lmk2angle.project_param (the
reference's project_param analogue).
"""
from __future__ import annotations

import argparse
import os
import os.path as osp
import pickle
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))

# MultiPIE camera labels indexed by the label file's pose id
# (multipie_orgnizedata.py:97)
POSE2CAM = ["11_0", "12_0", "09_0", "08_0", "13_0", "14_0", "05_1", "05_0",
            "04_1", "19_0", "20_0", "01_0", "24_0"]

# session -> recordid -> expression (multipie_orgnizedata.py:26-56)
_EXPR = {
    "01": {"01": "neutral", "02": "smile"},
    "02": {"01": "neutral", "02": "surprise", "03": "squint"},
    "03": {"01": "neutral", "02": "smile", "03": "disgust"},
    "04": {"01": "neutral", "02": "neutral", "03": "scream"},
}


def get_expression(session: str, recordid: str) -> str:
    return _EXPR.get(session, {}).get(recordid, "neutral")


def _imread_rgb(path):
    import cv2

    img = cv2.imread(path)
    if img is None:
        raise FileNotFoundError(path)
    return img[:, :, ::-1].copy()


def cmd_get_lmk(args):
    """FAN landmarks for every image in the list (multipie_get_lmk.py)."""
    from deep3dmap_tpu.models.face_alignment import FaceAlignment

    fa = FaceAlignment(weights_path=args.fan_weights)
    with open(args.list) as f:
        names = [l.strip() for l in f if l.strip()]
    os.makedirs(args.out, exist_ok=True)
    for i, name in enumerate(names):
        img = _imread_rgb(osp.join(args.root, name))
        pts = fa.get_landmarks_from_image(img)
        out = osp.join(args.out,
                       osp.basename(name).rsplit(".", 1)[0] + "_lm68.npy")
        np.save(out, np.asarray(pts, np.float32) if pts is not None
                else np.full((68, 2), -1, np.float32))
        if i % 100 == 0:
            print(f"lmk {i}/{len(names)}")


def read_obj(objpath: str) -> np.ndarray:
    """Vertex positions from a .obj (multipie_orgnizedata.py:11-24)."""
    verts = []
    with open(objpath) as f:
        for line in f:
            if line.startswith("v "):
                verts.append([float(x) for x in line.split()[1:4]])
    return np.asarray(verts, np.float64)


def cmd_organize(args):
    """Build the three pkl indexes (multipie_orgnizedata.py package_data)."""
    import scipy.io as sio

    from deep3dmap_tpu.core.all3dtrans.lmk2angle import project_param
    from deep3dmap_tpu.models.face_alignment import FaceAlignment

    os.makedirs(args.out, exist_ok=True)

    # 1. id/illum/expression -> pose -> image paths
    index = {}
    entries = []
    with open(args.labels) as f:
        for line in f:
            parts = line.strip().split()
            if len(parts) < 3:
                continue
            imgpath, idx, poseidx = parts[0], int(parts[1]), int(parts[2])
            base = osp.basename(imgpath)
            fields = base.split("_")
            session, recordid = fields[1], fields[2]
            illum = fields[-1].split(".")[0]
            expr = get_expression(session, recordid)
            pose = POSE2CAM[poseidx]
            index.setdefault(idx, {}).setdefault(illum, {}).setdefault(
                expr, {}).setdefault(pose, []).append(imgpath)
            entries.append((imgpath, idx, session, recordid))
    with open(osp.join(args.out, "multipie_idillumexp2poseimgpaths.pkl"),
              "wb") as f:
        pickle.dump(index, f)
    print("ids:", len(index))

    # 2. uvtex -> pose images (frontal-illum "10" bucket)
    if args.uvtex_list:
        uvtex2poseimgs = {}
        with open(args.uvtex_list) as f:
            for line in f:
                filename = line.strip()
                if not filename:
                    continue
                base = osp.basename(filename)
                idx = int(base.split("_")[0]) - 1
                session = base.split("_")[1]
                recordid = base.split("_")[2].split(".")[0]
                expr = get_expression(session, recordid)
                bucket = index.get(idx, {}).get("10", {}).get(expr)
                if bucket:
                    uvtex2poseimgs[filename] = bucket
        with open(osp.join(args.out, "multipie_uvtex2poseimgs.pkl"),
                  "wb") as f:
            pickle.dump(uvtex2poseimgs, f)
        print("uvtex:", len(uvtex2poseimgs))

    # 3. per-image aux info: FAN lm68 + weak-perspective (s, R, t) against
    # the template 3D keypoints (multipie_orgnizedata.py:166-193)
    if args.obj_list and args.model_shape:
        model_shape = sio.loadmat(args.model_shape)
        kpt_ind = model_shape["keypoints"][0].astype(np.int64)
        name2obj, id2obj = {}, {}
        with open(args.obj_list) as f:
            for line in f:
                p = line.strip()
                if not p:
                    continue
                base = osp.basename(p)
                fid = base.split("_")[0]
                id2obj.setdefault(fid, []).append(p)
                name2obj[base.split(".")[0]] = p

        fa = FaceAlignment(weights_path=args.fan_weights)
        rs = np.random.RandomState(0)
        aux = {}
        for imgpath, idx, session, recordid in entries:
            base = osp.basename(imgpath)
            fid = base.split("_")[0]
            pts = fa.get_landmarks_from_image(
                _imread_rgb(osp.join(args.root, imgpath)))
            if pts is None:
                aux[imgpath] = {"lm68": -1, "s": -1, "R": -1, "t": -1}
                continue
            key = f"{fid}_{session}_{recordid}"
            objp = name2obj.get(key)
            if objp is None:
                cands = id2obj.get(fid)
                if not cands:
                    aux[imgpath] = {"lm68": np.asarray(pts, np.float32),
                                    "s": -1, "R": -1, "t": -1}
                    continue
                objp = cands[rs.randint(len(cands))]
            shape = read_obj(osp.join(args.obj_root, objp))
            template68 = shape[kpt_ind]
            s, R, t = project_param(np.asarray(pts, np.float64), template68)
            aux[imgpath] = {"lm68": np.asarray(pts, np.float32),
                            "s": s, "R": R, "t": t}
        with open(osp.join(args.out, "multipie_imgpath2auxinfo.pkl"),
                  "wb") as f:
            pickle.dump(aux, f)
        print("aux:", len(aux))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p1 = sub.add_parser("get-lmk")
    p1.add_argument("--list", required=True, help="txt of image paths")
    p1.add_argument("--root", default="", help="image root dir")
    p1.add_argument("--out", required=True)
    p1.add_argument("--fan-weights", default=None)
    p1.set_defaults(fn=cmd_get_lmk)

    p2 = sub.add_parser("organize")
    p2.add_argument("--labels", required=True,
                    help="label txt: imgpath id poseidx per line")
    p2.add_argument("--root", default="")
    p2.add_argument("--out", required=True)
    p2.add_argument("--uvtex-list", default=None)
    p2.add_argument("--obj-list", default=None)
    p2.add_argument("--obj-root", default="")
    p2.add_argument("--model-shape", default=None,
                    help="Model_Shape.mat with 'keypoints'")
    p2.add_argument("--fan-weights", default=None)
    p2.set_defaults(fn=cmd_organize)

    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
