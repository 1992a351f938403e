/* Shim for <gtk/gtk.h>: reconstr.c includes it but uses nothing from it
 * (the include is vestigial in the reference). Empty on purpose. */
#ifndef SHIM_GTK_H
#define SHIM_GTK_H
#endif
