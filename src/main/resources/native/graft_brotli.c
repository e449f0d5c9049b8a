/* JNI shim binding the system libbrotli (RFC 7932 reference
 * implementation, BSD-licensed) to graft.sources.BrotliJni.
 *
 * The public brotli C API is declared inline because the dev headers
 * are not installed in this environment; the ABI below is the stable
 * public surface of libbrotlidec/libbrotlienc (decode.h / encode.h).
 * Compiled at first use by graft.sources.BrotliNative with gcc and
 * linked against the discovered shared libraries; when either the
 * compiler or the libraries are absent the Scala side degrades to the
 * documented named-error fail-fast, so this file is never a hard
 * dependency.
 *
 * Parquet BROTLI column chunks are raw brotli streams (no framing), so
 * one-shot whole-buffer decompress/compress is the correct unit — the
 * Hadoop codec layer above hands us the full page buffer.
 */
#include <jni.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

typedef enum {
  BROTLI_DECODER_RESULT_ERROR = 0,
  BROTLI_DECODER_RESULT_SUCCESS = 1,
  BROTLI_DECODER_RESULT_NEEDS_MORE_INPUT = 2,
  BROTLI_DECODER_RESULT_NEEDS_MORE_OUTPUT = 3
} BrotliDecoderResult;

typedef struct BrotliDecoderStateStruct BrotliDecoderState;
extern BrotliDecoderState* BrotliDecoderCreateInstance(
    void* (*alloc_func)(void*, size_t), void (*free_func)(void*, void*),
    void* opaque);
extern void BrotliDecoderDestroyInstance(BrotliDecoderState* state);
extern BrotliDecoderResult BrotliDecoderDecompressStream(
    BrotliDecoderState* state, size_t* available_in, const uint8_t** next_in,
    size_t* available_out, uint8_t** next_out, size_t* total_out);

#ifndef GRAFT_BROTLI_NO_ENC
extern int BrotliEncoderCompress(int quality, int lgwin, int mode,
    size_t input_size, const uint8_t* input_buffer, size_t* encoded_size,
    uint8_t* encoded_buffer);
extern size_t BrotliEncoderMaxCompressedSize(size_t input_size);
#endif

/* Returns the decompressed bytes, or NULL on corrupt/truncated input or
 * allocation failure (the Scala side raises IOException). sizeHint > 0
 * pre-sizes the output buffer (parquet pages know their uncompressed
 * size); the buffer still grows if the hint is short, so a wrong hint
 * can never truncate. */
JNIEXPORT jbyteArray JNICALL Java_graft_sources_BrotliJni_decompress(
    JNIEnv* env, jobject self, jbyteArray jin, jlong sizeHint) {
  (void)self;
  jsize in_len = (*env)->GetArrayLength(env, jin);
  jbyte* in = (*env)->GetByteArrayElements(env, jin, NULL);
  if (in == NULL) return NULL;
  size_t cap = sizeHint > 0 ? (size_t)sizeHint
                            : (size_t)in_len * 4 + 1024;
  uint8_t* out = (uint8_t*)malloc(cap);
  if (out == NULL) {
    (*env)->ReleaseByteArrayElements(env, jin, in, JNI_ABORT);
    return NULL;
  }
  BrotliDecoderState* st = BrotliDecoderCreateInstance(NULL, NULL, NULL);
  if (st == NULL) {
    free(out);
    (*env)->ReleaseByteArrayElements(env, jin, in, JNI_ABORT);
    return NULL;
  }
  size_t avail_in = (size_t)in_len;
  const uint8_t* next_in = (const uint8_t*)in;
  size_t total = 0;
  BrotliDecoderResult r;
  for (;;) {
    size_t avail_out = cap - total;
    uint8_t* next_out = out + total;
    r = BrotliDecoderDecompressStream(st, &avail_in, &next_in, &avail_out,
                                      &next_out, NULL);
    total = (size_t)(next_out - out);
    if (r == BROTLI_DECODER_RESULT_NEEDS_MORE_OUTPUT) {
      size_t grown = cap * 2;
      uint8_t* g = (uint8_t*)realloc(out, grown);
      if (g == NULL) { r = BROTLI_DECODER_RESULT_ERROR; break; }
      out = g;
      cap = grown;
    } else {
      break; /* SUCCESS, ERROR, or truncated (NEEDS_MORE_INPUT) */
    }
  }
  BrotliDecoderDestroyInstance(st);
  (*env)->ReleaseByteArrayElements(env, jin, in, JNI_ABORT);
  if (r != BROTLI_DECODER_RESULT_SUCCESS) {
    free(out);
    return NULL;
  }
  jbyteArray jout = (*env)->NewByteArray(env, (jsize)total);
  if (jout != NULL)
    (*env)->SetByteArrayRegion(env, jout, 0, (jsize)total, (jbyte*)out);
  free(out);
  return jout;
}

/* Returns the compressed bytes, or NULL on failure, or also NULL when
 * the shim was built without libbrotlienc (decoder-only environments —
 * the Scala side reports writes unsupported). */
JNIEXPORT jbyteArray JNICALL Java_graft_sources_BrotliJni_compress(
    JNIEnv* env, jobject self, jbyteArray jin, jint quality, jint lgwin) {
  (void)self;
#ifdef GRAFT_BROTLI_NO_ENC
  (void)env; (void)jin; (void)quality; (void)lgwin;
  return NULL;
#else
  jsize in_len = (*env)->GetArrayLength(env, jin);
  jbyte* in = (*env)->GetByteArrayElements(env, jin, NULL);
  if (in == NULL) return NULL;
  size_t cap = BrotliEncoderMaxCompressedSize((size_t)in_len);
  if (cap == 0) cap = (size_t)in_len + 1024; /* overflow guard per API doc */
  uint8_t* out = (uint8_t*)malloc(cap);
  if (out == NULL) {
    (*env)->ReleaseByteArrayElements(env, jin, in, JNI_ABORT);
    return NULL;
  }
  size_t out_len = cap;
  /* mode 0 = BROTLI_MODE_GENERIC */
  int ok = BrotliEncoderCompress((int)quality, (int)lgwin, 0,
                                 (size_t)in_len, (const uint8_t*)in,
                                 &out_len, out);
  (*env)->ReleaseByteArrayElements(env, jin, in, JNI_ABORT);
  if (!ok) {
    free(out);
    return NULL;
  }
  jbyteArray jout = (*env)->NewByteArray(env, (jsize)out_len);
  if (jout != NULL)
    (*env)->SetByteArrayRegion(env, jout, 0, (jsize)out_len, (jbyte*)out);
  free(out);
  return jout;
#endif
}
