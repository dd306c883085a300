"""ObjMtlConverter parity tool.

The reference ships a tiny CLI that scans an OBJ's `usemtl` statements and
emits a JSON material-name array to paste into a scene file's Mesh.Material
list (reference ObjMtlConverter/ObjMtlConverter/ObjMtlConverter.cpp:15-76,
output file material_json_array.txt).

Usage: python apps/obj_mtl_converter.py mesh.obj [-o material_json_array.txt]
"""

from __future__ import annotations

import argparse
import json


def extract_usemtl(path: str) -> "list[str]":
    """Material names in order of first use (one entry per usemtl line, as
    the reference emits — duplicates preserved so group order lines up)."""
    names = []
    with open(path, "r", errors="replace") as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2 and parts[0] == "usemtl":
                names.append(parts[1])
    return names


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("obj")
    ap.add_argument("-o", "--output", default="material_json_array.txt")
    args = ap.parse_args(argv)
    names = extract_usemtl(args.obj)
    text = json.dumps(names)
    with open(args.output, "w") as f:
        f.write(text)
    print(f"[Info] {len(names)} usemtl entries -> {args.output}")
    print(text)


if __name__ == "__main__":
    main()
