/* FASTQ -> 2-bit-code batch packer (native host ingest).
 *
 * Reference parity: the reference's only native component is its Cython
 * mapper inner loop (SURVEY.md 2.1 C4); its FASTQ reader is Python. On TPU
 * the mapper lives on-device, so the host-side bottleneck moves to ingest:
 * this translation unit parses FASTQ text and emits code rows (A=0 C=1 G=2
 * T=3, other=4) directly into the caller's pinned batch buffer, one memcpy
 * away from device_put (SURVEY.md 7.5 item 4).
 *
 * Build: cc -O3 -shared -fPIC packer.c -o libseekmer_packer.so
 * (driven by seekmer_tpu/native/packer.py at import time; no pybind11 —
 * plain C ABI + ctypes).
 */

#include <stddef.h>
#include <stdint.h>

static uint8_t LUT[256];

__attribute__((constructor)) static void init_lut(void) {
  for (int i = 0; i < 256; i++) LUT[i] = 4;
  LUT['A'] = 0; LUT['a'] = 0;
  LUT['C'] = 1; LUT['c'] = 1;
  LUT['G'] = 2; LUT['g'] = 2;
  LUT['T'] = 3; LUT['t'] = 3;
}

/* Parse complete FASTQ records from buf[0..len) and pack sequence rows.
 *
 * codes:   uint8 [max_reads, max_len], each row INVALID(4)-padded
 * lengths: int32 [max_reads] (clipped to max_len)
 * consumed: bytes of complete records parsed (caller carries the tail over)
 *
 * Returns reads parsed (>= 0), or -1 on malformed input.
 */
long seekmer_pack_fastq(const uint8_t *buf, long len, uint8_t *codes,
                        int32_t *lengths, long max_reads, long max_len,
                        long *consumed) {
  long n = 0, i = 0;
  *consumed = 0;
  while (n < max_reads) {
    if (i >= len) break;
    if (buf[i] != '@') return -1;
    while (i < len && buf[i] != '\n') i++;       /* header */
    if (i >= len) break;
    i++;
    long s = i;
    while (i < len && buf[i] != '\n') i++;       /* sequence */
    if (i >= len) break;
    long slen = i - s;
    if (slen > 0 && buf[s + slen - 1] == '\r') slen--;
    i++;
    if (i >= len) break;
    if (buf[i] != '+') return -1;
    while (i < len && buf[i] != '\n') i++;       /* separator */
    if (i >= len) break;
    i++;
    while (i < len && buf[i] != '\n') i++;       /* quality */
    if (i >= len) break;
    i++;

    long L = slen < max_len ? slen : max_len;
    uint8_t *row = codes + n * max_len;
    for (long j = 0; j < L; j++) row[j] = LUT[buf[s + j]];
    for (long j = L; j < max_len; j++) row[j] = 4;
    lengths[n] = (int32_t)L;
    n++;
    *consumed = i;
  }
  return n;
}
