"""Public repair API (reference ``pdfplumber/repair.py:8-76`` signature).

The reference repairs via Ghostscript (``-sDEVICE=pdfwrite`` re-emit); no
Ghostscript exists in this environment, so ``_repair`` delegates to the
from-scratch structural rebuilder in ``kernel/pdfrepair.py`` (brute object
scan -> re-serialize -> fresh xref/trailer, /Encrypt dropped after
decryption). ``gs_path`` is accepted for signature parity: when provided
AND resolvable, Ghostscript is used exactly like the reference; otherwise
the built-in rebuilder runs.
"""

from __future__ import annotations

import io
import pathlib
from typing import Optional, Union

from .kernel.pdfrepair import repair_bytes


def _read(path_or_fp) -> bytes:
    if isinstance(path_or_fp, (bytes, bytearray)):
        return bytes(path_or_fp)
    if hasattr(path_or_fp, "read"):
        return path_or_fp.read()
    with open(str(path_or_fp), "rb") as f:
        return f.read()


def _repair(
    path_or_fp,
    password: Optional[str] = None,
    gs_path: Optional[Union[str, pathlib.Path]] = None,
) -> io.BytesIO:
    data = _read(path_or_fp)
    if gs_path:
        import shutil
        import subprocess

        executable = shutil.which(str(gs_path)) or str(gs_path)
        args = [executable, "-o", "-", "-sDEVICE=pdfwrite",
                "-dPDFSETTINGS=/prepress"]
        if password:
            args += [f"-sPDFPassword={password}"]
        args += ["-"]
        proc = subprocess.Popen(
            args, stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        stdout, stderr = proc.communicate(data)
        if len(stderr):
            raise Exception(stderr.decode("utf-8"))
        return io.BytesIO(stdout)
    return io.BytesIO(repair_bytes(data, password=password or ""))


def repair(
    path_or_fp,
    outfile: Optional[Union[str, pathlib.Path]] = None,
    password: Optional[str] = None,
    gs_path: Optional[Union[str, pathlib.Path]] = None,
) -> Optional[io.BytesIO]:
    """Reference repair.py:57-76 contract: returns BytesIO, or writes
    ``outfile`` and returns None."""
    repaired = _repair(path_or_fp, password=password, gs_path=gs_path)
    if outfile:
        with open(str(outfile), "wb") as f:
            f.write(repaired.read())
        return None
    return repaired
