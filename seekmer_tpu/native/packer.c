/* FASTQ -> 2-bit-code batch packer (native host ingest).
 *
 * Reference parity: the reference's only native component is its Cython
 * mapper inner loop (SURVEY.md 2.1 C4); its FASTQ reader is Python. On TPU
 * the mapper lives on-device, so the host-side bottleneck moves to ingest:
 * this translation unit parses FASTQ text and emits code rows (A=0 C=1 G=2
 * T=3, other=4) directly into the caller's pinned batch buffer, one memcpy
 * away from device_put (SURVEY.md 7.5 item 4).
 *
 * Two entry points:
 *   seekmer_pack_fastq  — parse a caller-provided text buffer (chunk API);
 *   seekmer_open/next/close — a full streaming reader: file I/O + gzip
 *     inflate (zlib gzFile, which transparently reads plain files too) +
 *     parse + pack in ONE call, so a ctypes invocation releases the GIL
 *     for the whole decode. This is what lets io_workers threads scale:
 *     Python-side gzip.read loops hold the GIL for their glue and cap
 *     multi-file decode at ~1.3x (measured); the C reader does ~a whole
 *     chunk per GIL acquisition.
 *
 * Build: cc -O3 -shared -fPIC packer.c -lz -o libseekmer_packer.so
 * (driven by seekmer_tpu/native/packer.py at import time; no pybind11 —
 * plain C ABI + ctypes).
 */

#include <stddef.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <zlib.h>

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

/* ---- streaming reader: gzFile -> packed code rows ---------------------- */

typedef struct {
  gzFile gz;
  uint8_t *buf;
  long cap, len;
  int eof;
} seekmer_reader;

void *seekmer_open(const char *path) {
  seekmer_reader *r = (seekmer_reader *)calloc(1, sizeof(seekmer_reader));
  if (!r) return NULL;
  r->gz = gzopen(path, "rb");
  if (!r->gz) { free(r); return NULL; }
  gzbuffer(r->gz, 1 << 20);
  r->cap = 4l << 20;
  r->buf = (uint8_t *)malloc(r->cap);
  if (!r->buf) { gzclose(r->gz); free(r); return NULL; }
  return r;
}

/* Fill up to max_reads code rows. Returns reads produced (0 = clean EOF),
 * -1 malformed input, -2 I/O error. One call does file read + inflate +
 * parse + pack — the caller's ctypes invocation releases the GIL for all
 * of it. */
long seekmer_next(void *h, uint8_t *codes, int32_t *lengths, long max_reads,
                  long max_len) {
  seekmer_reader *r = (seekmer_reader *)h;
  for (;;) {
    if (r->len > 0) {
      long consumed = 0;
      long n = seekmer_pack_fastq(r->buf, r->len, codes, lengths, max_reads,
                                  max_len, &consumed);
      if (n < 0) return -1;
      if (n > 0) {
        memmove(r->buf, r->buf + consumed, r->len - consumed);
        r->len -= consumed;
        return n;
      }
    }
    if (r->eof) {
      /* no complete record left: only whitespace may remain */
      for (long j = 0; j < r->len; j++)
        if (r->buf[j] != '\n' && r->buf[j] != '\r' && r->buf[j] != ' ' &&
            r->buf[j] != '\t')
          return -1;
      return 0;
    }
    if (r->len == r->cap) { /* single record larger than the buffer */
      long nc = r->cap * 2;
      uint8_t *nb = (uint8_t *)realloc(r->buf, nc);
      if (!nb) return -2;
      r->buf = nb;
      r->cap = nc;
    }
    int got = gzread(r->gz, r->buf + r->len, (unsigned)(r->cap - r->len));
    if (got < 0) return -2;
    if (got == 0) {
      /* distinguish clean EOF from a TRUNCATED gzip stream: premature end
       * of a member leaves gzerror at Z_BUF_ERROR ("unexpected end of
       * file") while gzread still returns 0 — treating that as EOF
       * silently drops every read past the cut (a truncated .gz whose
       * recoverable prefix ends on a record boundary "succeeds"). */
      int errnum = Z_OK;
      gzerror(r->gz, &errnum);
      if (errnum != Z_OK && errnum != Z_STREAM_END) return -2;
      r->eof = 1;
    }
    r->len += got;
  }
}

/* UNCOMPRESSED byte offset of the next unparsed record: gztell() is the
 * uncompressed position of the gzFile read pointer, minus the bytes still
 * buffered (decoded but not yet parsed). Checkpoints store this offset;
 * resume seeks to it (seekmer_open_at). */
long seekmer_tell(void *h) {
  seekmer_reader *r = (seekmer_reader *)h;
  return (long)gztell(r->gz) - r->len;
}

/* Open positioned at an uncompressed byte offset. Plain files: one lseek
 * (no re-read). gzip members: zlib gzseek decompresses-and-discards up to
 * the offset inside this one call — no Python-side re-decode/re-batch.
 * Returns NULL on open or seek failure. */
void *seekmer_open_at(const char *path, long offset) {
  seekmer_reader *r = (seekmer_reader *)seekmer_open(path);
  if (!r) return NULL;
  if (offset > 0 && gzseek(r->gz, (z_off_t)offset, SEEK_SET) != (z_off_t)offset) {
    seekmer_close(r);
    return NULL;
  }
  return r;
}

void seekmer_close(void *h) {
  seekmer_reader *r = (seekmer_reader *)h;
  if (!r) return;
  if (r->gz) gzclose(r->gz);
  free(r->buf);
  free(r);
}
