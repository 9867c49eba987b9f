"""Render /tmp/parity_table.json (from parity_table.py) into PARITY.md,
replacing the <!-- PARITY_TABLE --> marker block.

Run: python scripts_dev/fill_parity_md.py [table.json]
"""

import json
import re
import sys


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/parity_table.json"
    with open(src) as f:
        table = json.load(f)
    rows = table["results"]
    g = rows[0]
    lines = [
        f"Geometry: latent {tuple(table['geometry'])} "
        f"({table['frames']} frames). Golden latent std "
        f"{g['latent_std']:.3f}, decoded video range "
        f"[{g['video_range'][0]:.2f}, {g['video_range'][1]:.2f}].",
        "",
        "| config | latent PSNR (dB) | video PSNR (dB) | latent rel-err |",
        "|---|---|---|---|",
    ]
    for row in rows[1:]:
        if row.get("golden"):
            lines.append(f"| **{row['config']}** | — | — | — |")
        elif "error" in row:
            lines.append(f"| {row['config']} | ERROR: "
                         f"{row['error'][:60]} | | |")
        else:
            lines.append(
                f"| {row['config']} | {row['latent_psnr_db']:.2f} | "
                f"{row['video_psnr_db']:.2f} | {row['latent_relerr']:.4f} |")
    block = "\n".join(lines)

    with open("PARITY.md") as f:
        md = f.read()
    marker = "<!-- PARITY_TABLE -->"
    if marker in md:
        md = md.replace(marker, marker + "\n\n" + block)
    else:
        md = re.sub(r"(## Results.*?\n)(.*?)(\n## )",
                    r"\1\n" + block.replace("\\", r"\\") + r"\3",
                    md, count=1, flags=re.S)
    with open("PARITY.md", "w") as f:
        f.write(md)
    print("PARITY.md updated")


if __name__ == "__main__":
    main()
