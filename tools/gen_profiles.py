"""Copy settings-preset DATA for implemented families from the reference
profiles/ tree (step counts, guidance values, accelerator-LoRA URLs — the
facts a compatible runtime must ship).  Run from the repo root."""
import json
import os
import shutil

REF = "/root/reference/profiles"
OUT = "wan2gp_tpu/config/profiles"

# reference profile dirs for families this framework implements
FAMILIES = ["wan", "wan_1.3B", "wan_2_2", "wan_2_2_5B", "wan_i2v",
            "flux", "hunyuan_1_5", "qwen", "minimax_h3", "krea2_presets",
            "ideogram4_presets", "ltx2_presets", "ltx2_distilled_presets",
            "ltx2_dev_accelerators", "z_image", "ltxv", "kandinsky"]

n = 0
for fam in FAMILIES:
    src = os.path.join(REF, fam)
    if not os.path.isdir(src):
        continue
    dst = os.path.join(OUT, fam)
    os.makedirs(dst, exist_ok=True)
    for f in sorted(os.listdir(src)):
        if not f.endswith(".json"):
            continue
        try:
            data = json.load(open(os.path.join(src, f)))
        except Exception:
            continue
        # keep settings keys only (drop embedded media/comments)
        data = {k: v for k, v in data.items()
                if not k.startswith("_") and k != "image_prompt"}
        with open(os.path.join(dst, f), "w") as out:
            json.dump(data, out, indent=1)
        n += 1
print("profiles written:", n)
