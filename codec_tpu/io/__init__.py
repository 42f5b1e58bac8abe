from .gguf import GGUFReader, GGUFWriter
from .wav import read_wav, write_wav, to_mono

__all__ = ["GGUFReader", "GGUFWriter", "read_wav", "write_wav", "to_mono"]
