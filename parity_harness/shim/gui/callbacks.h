/* Shim for gui/callbacks.h: demosaicing.c includes it but the functions the
 * harness exercises (debayer_buffer and the 5 bayer_* kernels) use nothing
 * from it. transform.c (wavelets) also includes it and calls
 * siril_log_message via the _() gettext macro — declared here because
 * transform.c does not include core/proto.h. */
#ifndef SHIM_GUI_CALLBACKS_H
#define SHIM_GUI_CALLBACKS_H

#ifndef _
#define _(String) (String)
#endif
char *siril_log_message(const char *format, ...);

#endif
