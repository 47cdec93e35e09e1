"""Host CPU fingerprint for the persistent XLA compile cache.

CPU-backend cache entries are AOT machine code specialized to the
*compiling* host's LLVM target features. Under firecracker the
/proc/cpuinfo template is identical on every host ("Intel(R) Xeon(R)
Processor @ 2.10GHz", microcode 0x1), so a cpuinfo-flag key cannot
distinguish physical hosts -- but the raw CPUID instruction passes
through, and LLVM's host detection (the source of tuning features like
+prefer-no-gather that sprayed 'machine features mismatch' errors in
MULTICHIP_r02.json) is itself CPUID-derived. Key by CPUID directly.
"""

from __future__ import annotations

import hashlib
import platform


def _cpuid_words() -> list[int]:
    """EAX/EBX/ECX/EDX for the identity + feature leaves, via a tiny
    executable CPUID thunk (x86-64 only; [] on failure)."""
    if platform.machine() != "x86_64":
        return []
    try:
        import ctypes
        import mmap

        code = bytes([
            0x53,                    # push rbx
            0x89, 0xF8,              # mov eax, edi
            0x31, 0xC9,              # xor ecx, ecx
            0x0F, 0xA2,              # cpuid
            0x89, 0x06,              # mov [rsi], eax
            0x89, 0x5E, 0x04,        # mov [rsi+4], ebx
            0x89, 0x4E, 0x08,        # mov [rsi+8], ecx
            0x89, 0x56, 0x0C,        # mov [rsi+12], edx
            0x5B,                    # pop rbx
            0xC3,                    # ret
        ])
        buf = mmap.mmap(-1, len(code),
                        prot=mmap.PROT_READ | mmap.PROT_WRITE | mmap.PROT_EXEC)
        buf.write(code)
        addr = ctypes.addressof(ctypes.c_char.from_buffer(buf))
        fn = ctypes.CFUNCTYPE(
            None, ctypes.c_uint32, ctypes.POINTER(ctypes.c_uint32 * 4))(addr)
        words: list[int] = []
        out = (ctypes.c_uint32 * 4)()
        # 0: vendor, 1: family/model/stepping + features, 7: ext features,
        # 0x80000001: AMD ext, 0x1A: hybrid core type
        for leaf in (0x0, 0x1, 0x7, 0x80000001, 0x1A):
            fn(leaf, ctypes.byref(out))
            words.extend(int(w) for w in out)
        del fn  # keep the mmap alive until after the calls
        return words
    except Exception:
        return []


def host_cache_tag(n: int = 10) -> str:
    """Short stable tag identifying this host's CPU for cache-dir keying."""
    feats = platform.machine()
    words = _cpuid_words()
    if words:
        feats += ":" + ",".join(f"{w:08x}" for w in words)
    else:
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith("flags"):
                        feats += " ".join(sorted(line.split(":")[1].split()))
                        break
        except OSError:
            pass
    return hashlib.sha1(feats.encode()).hexdigest()[:n]
