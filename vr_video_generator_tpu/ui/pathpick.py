"""Console path picker — the framework's stand-in for the reference's
vendored dearpygui file dialog (reference file_dialog/fdialog.py: drive
enumeration, directory navigation, extension filters, multi-select). The
console form covers navigation + extension filtering; selection returns an
absolute path."""

from __future__ import annotations

import os
from typing import Optional, Sequence


def list_entries(directory: str,
                 extensions: Optional[Sequence[str]] = None) -> list:
    """Directories first, then files filtered by extension."""
    try:
        names = sorted(os.listdir(directory))
    except OSError:
        return []
    dirs = [n for n in names if os.path.isdir(os.path.join(directory, n))]
    files = [n for n in names if not os.path.isdir(os.path.join(directory, n))]
    if extensions:
        files = [n for n in files
                 if os.path.splitext(n)[1].lower() in extensions]
    return [(n, True) for n in dirs] + [(n, False) for n in files]


def pick_path(start: str = ".", extensions: Optional[Sequence[str]] = None,
              input_fn=input, print_fn=print) -> Optional[str]:  # pragma: no cover - interactive
    """Navigate with numbers, '..' to go up, 'this' to select the current
    directory, empty input to cancel."""
    current = os.path.abspath(start)
    while True:
        entries = list_entries(current, extensions)
        print_fn(f"[{current}]")
        for i, (name, is_dir) in enumerate(entries):
            print_fn(f"  {i}: {name}{'/' if is_dir else ''}")
        choice = input_fn("path> ").strip()
        if choice == "":
            return None
        if choice == "..":
            current = os.path.dirname(current)
            continue
        if choice == "this":
            return current
        if choice.isdigit() and int(choice) < len(entries):
            name, is_dir = entries[int(choice)]
            target = os.path.join(current, name)
            if is_dir:
                current = target
            else:
                return target
        else:
            # treat as a literal path
            if os.path.exists(choice):
                return os.path.abspath(choice)
            print_fn("not found")
