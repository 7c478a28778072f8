// Minimal DOM shim to execute the UI SPA under node against a live
// ShaperServer: usage `node ui_dom_harness.js <app.js> <baseUrl>`.
// Exercises every page route, clicking nothing — the goal is that each
// page builds its DOM from real API responses without throwing, and
// that the dashboard page materializes the expected chart/table nodes.
'use strict';
const fs = require('fs');
const [, , appPath, baseUrl, authEmail, authPassword] = process.argv;

// ----------------------------------------------------------- DOM shim
class ClassList {
  constructor(el) { this.el = el; this.set = new Set(); }
  toggle(c) { this.set.has(c) ? this.set.delete(c) : this.set.add(c); }
  add(c) { this.set.add(c); }
  contains(c) { return this.set.has(c); }
}
class Element {
  constructor(tag, ns) {
    this.tagName = tag.toUpperCase();
    this.ns = ns || null;
    this.children = [];
    this.attrs = {};
    this.listeners = {};
    this.parentNode = null;
    this.value = '';
    this.checked = false;
    this._text = '';
    this.classList = new ClassList(this);
    this.style = {};
  }
  appendChild(c) {
    if (typeof c === 'object' && c !== null) c.parentNode = this;
    this.children.push(c);
    return c;
  }
  setAttribute(k, v) {
    this.attrs[k] = String(v);
    if (k === 'class') this.classList.set = new Set(String(v).split(/\s+/));
    if (k === 'value') this.value = String(v);
    if (k === 'checked') this.checked = true;
  }
  getAttribute(k) { return this.attrs[k] ?? null; }
  addEventListener(ev, fn) { (this.listeners[ev] ||= []).push(fn); }
  dispatch(ev, payload) {
    for (const fn of this.listeners[ev] || []) fn({ target: this, preventDefault() {}, ...payload });
  }
  remove() {
    if (this.parentNode)
      this.parentNode.children = this.parentNode.children.filter(c => c !== this);
  }
  set className(v) { this.setAttribute('class', v); }
  get className() { return this.attrs.class || ''; }
  set innerHTML(v) { this.children = []; this._text = String(v); }
  get innerHTML() { return this._text; }
  set textContent(v) { this.children = []; this._text = String(v); }
  get textContent() {
    let out = this._text;
    for (const c of this.children)
      out += typeof c === 'object' && c !== null ? c.textContent : String(c);
    return out;
  }
  get contentWindow() { return { location: { reload() {} } }; }
  *walk() {
    yield this;
    for (const c of this.children)
      if (typeof c === 'object' && c !== null) yield* c.walk();
  }
  querySelector(sel) {
    for (const el of this.walk()) {
      if (el === this) continue;
      if (matches(el, sel)) return el;
    }
    return null;
  }
  querySelectorAll(sel) {
    const out = [];
    for (const el of this.walk()) if (el !== this && matches(el, sel)) out.push(el);
    return out;
  }
}
function matches(el, sel) {
  if (sel.startsWith('#')) return el.attrs.id === sel.slice(1);
  if (sel.startsWith('.')) return el.classList.contains(sel.slice(1));
  if (sel.startsWith('[') && sel.endsWith(']'))
    return el.attrs[sel.slice(1, -1)] !== undefined;
  return el.tagName === sel.toUpperCase();
}
const document = {
  body: new Element('body'),
  createElement: t => new Element(t),
  createElementNS: (ns, t) => new Element(t, ns),
  createTextNode: t => String(t),
  listeners: {},
  addEventListener(ev, fn) { (this.listeners[ev] ||= []).push(fn); },
  querySelector(sel) { return this.body.querySelector(sel); },
};
const appRoot = new Element('div');
appRoot.setAttribute('id', 'app');
document.body.appendChild(appRoot);

const location = {
  pathname: '/', search: '', href: '/',
  reload() {},
};
const history = {
  pushState(s, t, url) { setUrl(url); },
  replaceState(s, t, url) { setUrl(url); },
};
function setUrl(url) {
  const [p, q] = String(url).split('?');
  location.pathname = p || '/';
  location.search = q ? '?' + q : '';
}
const storage = new Map();
const localStorage = {
  getItem: k => (storage.has(k) ? storage.get(k) : null),
  setItem: (k, v) => storage.set(k, String(v)),
  removeItem: k => storage.delete(k),
};
const window = { addEventListener() {}, location };
function confirm() { return true; }

// Real fetch against the live server, with relative-URL resolution.
const realFetch = global.fetch;
async function fetchShim(path, opts) {
  const url = path.startsWith('http') ? path : baseUrl + path;
  return realFetch(url, opts);
}

// ------------------------------------------------------------- run app
const src = fs.readFileSync(appPath, 'utf8');
const sandbox = {
  document, window, location, history, localStorage, confirm,
  fetch: fetchShim, URL, URLSearchParams, Node: Element,
  setTimeout, clearTimeout, console, Math, JSON, Date, Promise,
};
const vm = require('vm');
const ctx = vm.createContext(sandbox);
vm.runInContext(src, ctx, { filename: 'ui_app.js' });

// The app binds render() via DOMContentLoaded; capture it by firing.
let renderFn = null;
for (const fn of document.listeners.DOMContentLoaded || []) renderFn = fn;
if (!renderFn) { console.error('FAIL: no DOMContentLoaded handler'); process.exit(1); }

const failures = [];
function expect(cond, msg) { if (!cond) failures.push(msg); }

async function visit(path) {
  setUrl(path);
  await renderFn();
  // let any fire-and-forget refreshes settle
  await new Promise(r => setTimeout(r, 300));
  return appRoot;
}

// Poll until the app root's text contains `needle` (fire-and-forget
// fetches land whenever the server answers — a fixed settle races a
// loaded host). Resolves early on match; gives up after `ms`.
async function waitForText(needle, ms = 8000) {
  const t0 = Date.now();
  while (Date.now() - t0 < ms) {
    if (appRoot.textContent.includes(needle)) return true;
    await new Promise(r => setTimeout(r, 100));
  }
  return appRoot.textContent.includes(needle);
}

(async () => {
  if (authEmail) {
    // login-required instance: / redirects to /login; the form mints a
    // session token into localStorage and navigates back.
    let root = await visit('/');
    expect(location.pathname === '/login',
      'unauthenticated / redirects to /login, got ' + location.pathname);
    const inputs = appRoot.querySelectorAll('input');
    const email = inputs.find(i => i.attrs.type === 'email');
    const pw = inputs.find(i => i.attrs.type === 'password');
    const form = appRoot.querySelector('form');
    expect(email && pw && form, 'login form fields present');
    email.value = authEmail; pw.value = authPassword;
    await Promise.all((form.listeners.submit || []).map(fn =>
      fn({ preventDefault() {} })));
    await new Promise(r => setTimeout(r, 400));
    expect(!!localStorage.getItem('shaper_token'), 'token stored after login');
    expect(location.pathname === '/', 'redirected home after login');
  }

  // home: lists the two dashboards and the task
  let root = await visit('/');
  let txt = root.textContent;
  expect(txt.includes('Demo dashboard'), 'home lists Demo dashboard: ' + txt.slice(0, 200));
  expect(txt.includes('Count docs'), 'home lists the task');

  // dashboard: every chart family materializes
  root = await visit('/dashboards/demo');
  txt = root.textContent;
  expect(!root.querySelector('.err'), 'dashboard has no error: ' + txt.slice(0, 300));
  const svgs = root.querySelectorAll('svg');
  expect(svgs.length >= 4, `dashboard draws >=4 svgs (got ${svgs.length})`);
  expect(root.querySelectorAll('polyline').length >= 1, 'linechart polyline');
  expect(root.querySelectorAll('rect').length >= 2, 'barchart rects');
  expect(root.querySelectorAll('path').length >= 2, 'pie/gauge paths');
  expect(root.querySelector('.stat'), 'value stat tile');
  expect(root.querySelectorAll('table').length >= 1, 'data table');
  expect(root.querySelector('select'), 'dropdown widget');
  expect(txt.includes('Regional revenue'), 'section title rendered');

  // widget interaction: choosing a region refetches with the param
  root = await visit('/dashboards/filtered');
  const sel = root.querySelector('select');
  expect(sel, 'filtered dashboard has dropdown');
  if (sel) {
    sel.value = 'ASIA';
    sel.dispatch('change');
    await new Promise(r => setTimeout(r, 600));
    expect(location.search.includes('region=ASIA'),
      'param written to URL: ' + location.search);
    const rows = appRoot.querySelectorAll('rect');
    expect(rows.length >= 1, 'filtered barchartHorizontal rendered');
  }

  // task page: content + run-now button (async fetch — poll AND re-visit:
  // a starved host can slow or drop the fire-and-forget fetch entirely,
  // so re-dispatch it rather than just waiting longer)
  let taskOk = false;
  for (let i = 0; i < 6 && !taskOk; i++) {
    root = await visit('/tasks/t-demo');
    taskOk = await waitForText('Count docs', 10000);
  }
  txt = root.textContent;
  expect(txt.includes('Count docs'), 'task page title');
  expect(txt.includes('Run now'), 'run-now button');

  // editor
  root = await visit('/dashboards/demo/edit');
  expect(root.querySelector('textarea'), 'editor textarea');
  expect(root.querySelector('iframe'), 'preview iframe');

  // admin + settings + new build without throwing
  for (const p of ['/new', '/admin/keys', '/admin/security', '/settings']) {
    root = await visit(p);
    expect(root.children.length > 0, p + ' renders');
  }

  // standalone /view/:id — same dashboard, forced-embed (no nav chrome)
  root = await visit('/view/demo');
  expect(!root.querySelector('nav'), '/view renders without nav chrome');
  expect(root.querySelectorAll('svg').length >= 4,
    '/view draws the dashboard charts');

  // /embed/shaper.js loader: fetch from the live server, eval under
  // the shim, assert auto-render and explicit render() both inject
  // iframes onto /view/:id (r11, reference serveEmbedJS parity)
  {
    const res = await fetchShim('/embed/shaper.js');
    expect(res.status === 200, 'embed loader served');
    const loaderSrc = await res.text();
    const host = new Element('div');
    host.setAttribute('data-shaper-dashboard', 'demo');
    document.body.appendChild(host);
    document.querySelectorAll = sel => document.body.querySelectorAll(sel);
    const lsandbox = { document, window, URLSearchParams, console };
    vm.runInContext(loaderSrc, vm.createContext(lsandbox),
      { filename: 'shaper.js' });
    expect(window.shaper && window.shaper.defaultBaseUrl === baseUrl,
      'defaultBaseUrl injected: ' + (window.shaper && window.shaper.defaultBaseUrl));
    const auto = host.querySelector('iframe');
    expect(auto, 'loader auto-renders [data-shaper-dashboard]');
    expect(auto && String(auto.src).includes('/view/demo'),
      'auto iframe targets /view/:id: ' + (auto && auto.src));
    const el2 = new Element('div');
    window.shaper.render({ container: el2, dashboardId: 'demo',
      jwt: 'tok123' });
    const f2 = el2.querySelector('iframe');
    expect(f2 && String(f2.src).includes('jwt=tok123'),
      'render() forwards the jwt param: ' + (f2 && f2.src));
    host.remove();
  }

  if (failures.length) {
    console.error('FAIL\n' + failures.map(f => ' - ' + f).join('\n'));
    process.exit(1);
  }
  console.log('UI_HARNESS_OK');
  process.exit(0);
})().catch(e => { console.error('FAIL uncaught: ' + (e.stack || e)); process.exit(1); });
