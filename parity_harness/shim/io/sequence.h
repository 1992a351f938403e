/* Shim for io/sequence.h: only what the compiled seqfile.c touches.
 * initialize_sequence and ends_with come from verbatim extractions in
 * the harness TU; update_used_memory is a support.c stub. */
#ifndef SHIM_IO_SEQUENCE_H
#define SHIM_IO_SEQUENCE_H

#include "core/siril.h"

sequence *readseqfile(const char *name);
int writeseqfile(sequence *seq);
gboolean existseq(const char *name);
int buildseqfile(sequence *seq, int force_recompute);
void initialize_sequence(sequence *seq, gboolean is_zeroed);

gboolean ends_with(const char *str, const char *ending);
void update_used_memory(void);

#endif
