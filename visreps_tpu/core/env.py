"""Environment variable / .env handling and pickle IO.

Reference parity: visreps/utils.py:269-296 (get_env_var + load_pickle)
with a minimal built-in .env parser instead of python-dotenv.
"""
from __future__ import annotations

import os
import pickle
from pathlib import Path

_DOTENV_LOADED = False


def load_dotenv(path: str | Path = ".env") -> None:
    """Load KEY=VALUE lines from a .env file into os.environ (no overwrite)."""
    global _DOTENV_LOADED
    p = Path(path)
    if not p.exists():
        _DOTENV_LOADED = True
        return
    for line in p.read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        key, val = line.split("=", 1)
        key, val = key.strip(), val.strip().strip("\"'")
        os.environ.setdefault(key, val)
    _DOTENV_LOADED = True


def get_env_var(key: str) -> str:
    """Path from env var, loading .env on first miss. Returns '' if unset."""
    if key not in os.environ and not _DOTENV_LOADED:
        load_dotenv()
    return os.environ.get(key, "")


def load_pickle(file_path: str | Path):
    try:
        with open(file_path, "rb") as f:
            return pickle.load(f)
    except FileNotFoundError:
        raise FileNotFoundError(f"Pickle file not found at path: {file_path}")
    except pickle.UnpicklingError:
        raise pickle.UnpicklingError(
            f"Error unpickling file at {file_path}. File may be corrupted."
        )
