// C ABI for the native text frontend (consumed by Python via ctypes).
//
// String-list results are returned as a single heap-allocated UTF-8 buffer
// with fields separated by '\x1e' (record separator); free with wetts_free.

#ifndef WETTS_C_API_H_
#define WETTS_C_API_H_

#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

void wetts_free(char* ptr);

// sentence segmentation
char* wetts_sentence_segment(const char* text, size_t max_clause_len);

// word segmentation
void* wetts_wordbreak_new(const char* lexicon_path);
void wetts_wordbreak_delete(void* handle);
char* wetts_wordbreak_segment(void* handle, const char* text);

// lexicon
void* wetts_lexicon_new(const char* path);
void wetts_lexicon_delete(void* handle);
int wetts_lexicon_num_prons(void* handle, const char* word);
char* wetts_lexicon_prons(void* handle, const char* word);

// tone sandhi: word (UTF-8 chars) + '\x1e'-separated pinyin; returns the
// rewritten pinyin list
char* wetts_sandhi(const char* word, const char* pinyin_list);

// English G2P
void* wetts_g2p_en_new(const char* cmudict_path);
void wetts_g2p_en_delete(void* handle);
char* wetts_g2p_en_convert(void* handle, const char* grapheme);

#ifdef __cplusplus
}
#endif

#endif  // WETTS_C_API_H_
